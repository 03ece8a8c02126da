package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Typed metadata carried alongside every media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                     durationMs: Int, format: String)

/** One media object: opaque bytes + typed metadata. At 100 TB the
  * payload column is the dominant I/O — every operator below either
  * never touches it (metadata-only transforms) or streams it through a
  * batched per-partition kernel exactly once. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                    meta: MediaMeta)

/** Output of the decode/feature-extract stage. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         features: Array[Float])

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with a typed metadata struct.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (a 16-bin byte histogram standing in for "pixels →
  * model features"); everything around it — the schema, the binary
  * column, the batched `mapPartitions` shape with per-batch "model"
  * initialization, partitioning, and the explode-per-frame plan — is the
  * real Spark plumbing a production decode would use unchanged (swap
  * [[FakeDecoder]] for an ONNX/JNI session and nothing else moves).
  *
  * Reference delegates all media handling to GCS blobs
  * (normalization.py:53-79 treats objects as opaque byte streams); this
  * module is the engine-native version of that stance.
  */
object Multimodal {

  /** The stub "model". A real implementation holds an ONNX session or a
    * JNI codec handle — expensive to create, so [[decodeFeatures]]
    * instantiates it once per batch, never per row. */
  final class FakeDecoder {
    /** 16-bin histogram over the high nibble of each byte, L1-normalized
      * — deterministic, order-independent, and shaped like a real
      * feature vector. The normalization divides in DOUBLE and rounds
      * once to float: integer bin counts and one double divide are
      * engine-portable ops, which is what lets the m03 aggregate carry
      * an exact DuckDB oracle (a float÷float divide would bake
      * JVM-float semantics into the stub for no modeling gain). */
    def decode(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Int](16)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xF0) >>> 4) += 1
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      val out = new Array[Float](16)
      i = 0
      while (i < 16) { out(i) = (bins(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Media table derived deterministically from `documents` (the
    * container ships no real media; payload = UTF-8 bytes of the text).
    * kind cycles image/audio/video by doc_id; metadata is a pure
    * function of the byte length so the DuckDB oracle can reproduce it. */
  def media(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    // fan = false: the m-family 100 TB law is that NO exchange ever
    // carries the payload (PlanGateSpec m13/m15) — the scan fan-out
    // would add exactly such an exchange, so media reads stay unfanned.
    t(s, dir, "documents", fan = false)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        col("text").cast("binary").as("payload"),
        struct(
          (lit(64) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
          (lit(64) + pmod(col("n_chars"), lit(48))).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (col("n_chars") * 10).cast("int").as("durationMs"),
          element_at(array(lit("png"), lit("wav"), lit("mp4")),
            (col("doc_id") % 3).cast("int") + 1).as("format")).as("meta"))
      .as[MediaRow]
  }

  /** Decode + feature-extract: the batched per-partition kernel. One
    * decoder instance per batch (amortizes model init), one pass over
    * each payload. This is the Scala-native analog of a pandas-batched
    * UDF: iterator-of-batches in, iterator-of-rows out, no driver
    * involvement, scales with partitions. */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val decoder = new FakeDecoder // per-batch init, as a real model session would be
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length, decoder.decode(m.payload))
        }
      }
    }
  }

  /** Metadata-only resize: rescales width/height, payload untouched —
    * at scale this must NOT deserialize the binary column, and doesn't:
    * it is a pure Column projection. */
  def resizeMeta(ds: Dataset[MediaRow], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    ds.toDF().select(
      col("media_id"), col("kind"), col("payload"),
      struct(
        floor(col("meta.width") * scale).cast("int").as("width"),
        floor(col("meta.height") * scale).cast("int").as("height"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.durationMs").as("durationMs"),
        col("meta.format").as("format")).as("meta"))
  }

  /** Frame sampling for video rows: one output row per sampled frame,
    * every `stepMs`. The frame list is generated by `sequence` +
    * `explode` — a codegen'd generator, no UDF, no driver loop; the
    * payload is NOT duplicated per frame (only the offset is carried). */
  def frameSample(ds: Dataset[MediaRow], stepMs: Int = 500): DataFrame =
    ds.toDF()
      .filter(col("kind") === "video" && col("meta.durationMs") > 0)
      .select(col("media_id"), col("meta.durationMs").cast("bigint").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.durationMs").cast("bigint") - 1,
          lit(stepMs.toLong))).as("frame_off_ms"))
      .withColumn("frame_idx", (col("frame_off_ms") / stepMs).cast("bigint"))
      .select("media_id", "frame_idx", "frame_off_ms", "duration_ms")

  // ----- query-registry entries -----

  /** Metadata stats per media row — fully SQL-expressible (metadata is a
    * pure function of n_chars), so it gets an exact DuckDB oracle. */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    media(s, dir).toDF()
      .select(col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.durationMs").as("duration_ms"))
      .orderBy("media_id")

  /** Sampled video frames — oracle: integer arithmetic over n_chars. */
  def frames(s: SparkSession, dir: String): DataFrame =
    frameSample(media(s, dir)).orderBy("media_id", "frame_idx")

  /** Byte-level histogram facts per kind — the integer-exact face of the
    * decode kernel (same nibble binning as [[FakeDecoder]]), so the
    * multimodal path gets a real DuckDB oracle, not just a row count.
    * ONE codegen'd payload scan per row ([[graft.functions.NibbleHistogram]])
    * emits all 16 bins; the per-bin picks are `element_at` projections —
    * no UDF anywhere in the multimodal path. */
  def byteHistogram(s: SparkSession, dir: String): DataFrame =
    media(s, dir).toDF()
      .select(col("kind"), length(col("payload")).as("n_bytes"),
        graft.functions.VectorExprs.nibbleHistogram(col("payload")).as("hist"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(element_at(col("hist"), 3)).as("bin2_bytes"),
        sum(element_at(col("hist"), 7)).as("bin6_bytes"))
      .orderBy("kind")

  /** Thumbnail-resize metadata per media row (max side 96): the
    * metadata-only projection face of [[resizeMeta]] — integer-exact,
    * so it gets a full DuckDB oracle. */
  def resizedDims(s: SparkSession, dir: String): DataFrame =
    resizeMeta(media(s, dir), maxSide = 96)
      .select(col("media_id"), col("kind"),
        col("meta.width").as("r_width"), col("meta.height").as("r_height"))
      .orderBy("media_id")

  /** m03: decoded features aggregated per kind. ORACLE-EXACT: the stub
    * decode is integer bin counts + one double divide rounded to float
    * (see [[FakeDecoder.decode]]), so the DuckDB oracle replays it with
    * the m04 hex-nibble trick — the mapPartitions/batched-kernel
    * plumbing is what a real decoder would swap into, and now even the
    * stub's output is driver-verified, not just row-counted. */
  def featuresByKind(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(media(s, dir)).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("features"), 5)), 4).as("avg_f4"),
        round(sum(col("n_bytes")).cast("double"), 4).as("total_bytes"))
      .orderBy("kind")

  /** m07: perceptual similar-media search — the s01 broadcast-queries
    * shape applied to the MEDIA column: each query payload's 16-bin
    * nibble histogram (the [[FakeDecoder]] feature, computed by the
    * codegen'd `NibbleHistogram` — no UDF) is cosine-scored against
    * every corpus payload's histogram, top-k per query. This is the
    * "find visually/acoustically similar assets" primitive an
    * image-dedup or caption-transfer pipeline runs; with a real
    * decoder the histogram column becomes an embedding column and
    * NOTHING else in the plan moves.
    *
    * At 100 TB: one payload scan (histograms are 16 longs — payloads
    * never shuffle), queries broadcast, codegen'd 16-dim dots, top-k
    * per query. Cosine is rounded to 6 decimals before ranking, ties
    * to the smaller id — oracle-exact. */
  def mediaSimilar(s: SparkSession, dir: String,
                   nQueries: Int = 3, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExprs.{dot, nibbleHistogram}
    val v = media(s, dir).toDF()
      .select(col("media_id"),
        transform(nibbleHistogram(col("payload")), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val queries = v.filter(col("media_id") < nQueries)
      .select(col("media_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("q_nrm"))
    val scored = v.join(broadcast(queries), col("media_id") =!= col("q_id"))
      .select(col("q_id"), col("media_id").as("n_id"),
        round(dot(col("qv"), col("v")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** m06: content-hash dedup over BINARY payloads — the d01 shape
    * applied to the media column: md5 of the raw bytes (no text
    * normalization — for images/audio the bytes ARE the identity),
    * group, keep the smallest media_id. At 100 TB this is how
    * image/video corpora dedup: the shuffle carries 16-byte digests,
    * the payloads never leave their scan partitions. */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    media(s, dir).toDF()
      .select(col("media_id"), md5(col("payload")).as("fp"))
      .groupBy("fp")
      .agg(min("media_id").as("keeper"), count(lit(1)).as("n_copies"))
      .select("fp", "keeper", "n_copies")
      .orderBy("keeper")

  /** The m06 store artifact: one 16-byte content fingerprint per
    * payload — what continuous media ingestion persists instead of
    * payload bytes (the d11 store discipline for binary; payloads
    * never leave their scan partitions). */
  def mediaFps(df: DataFrame, idCol: String,
               payloadCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), md5(col(payloadCol)).as("fp"))

  /** m12: INCREMENTAL media dedup — m06 under continuous ingestion
    * (the d11/d12/d15/d17 store family's binary member): a new
    * payload batch fingerprints map-side, anti-joins the accumulated
    * 16-byte store, and the survivors are the admitted families
    * (keeper = smallest id). Per-batch work is batch-sized; the store
    * grows one slim row per admitted DISTINCT payload. */
  def incrementalMediaDedup(s: SparkSession, dir: String,
                            splitAt: Long = Dedup.D12SplitAt): DataFrame = {
    val m = media(s, dir).toDF()
    incrementalMediaDedup(
      mediaFps(m.filter(col("media_id") >= splitAt), "media_id", "payload"),
      mediaFps(m.filter(col("media_id") < splitAt), "media_id", "payload"))
  }

  /** The probe half over pre-fingerprinted (media_id, fp) frames. */
  def incrementalMediaDedup(batchFps: DataFrame,
                            storeFps: DataFrame): DataFrame =
    batchFps
      .join(storeFps.select("fp").distinct(), Seq("fp"), "left_anti")
      .groupBy("fp")
      .agg(min("media_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  /** m08: perceptual-BUCKET near-dup clusters — the pHash primitive
    * between m06's byte-exact dedup and m07's top-k search: each
    * payload's 16-bin nibble histogram is quantized to eighths of the
    * byte length (INTEGER arithmetic — `8·bin div n`, exact on both
    * engines), the 16 levels concatenate to a signature, and
    * same-signature assets are one perceptual family (keeper =
    * smallest id). A byte-identical copy always shares the signature;
    * a lightly-edited copy (re-encode, metadata strip) usually does —
    * the recall/precision trade every production pHash bucket makes.
    *
    * At 100 TB: ONE codegen'd payload scan emits the 16 counts, the
    * shuffle carries a ≤48-char signature per asset (payloads never
    * move), and clustering is a plain groupBy — no pair join exists
    * anywhere, which is what lets this run on billions of images
    * where m07's scoring pass is reserved for candidate sets. */
  /** m09 CDC geometry — single-sourced into the oracle replay.
    * Expected chunk ≈ [[M09Divisor]] bytes. */
  val M09Window = 8
  val M09Divisor = 64

  /** m09: content-defined chunking + sub-file dedup accounting — the
    * third rung of the media-dedup ladder (m06 whole-file exact, m08
    * perceptual buckets, THIS chunk-level sharing): each payload is cut
    * at content-defined boundaries ([[graft.functions.Hashing.cdcChunks]]
    * — boundaries re-synchronize across inserts/edits, so shifted
    * copies of shared content still dedup, which a fixed grid cannot
    * do), every chunk gets a 16-byte fingerprint, and per-media
    * accounting reports how many of its chunks/bytes are shared with
    * ANY other chunk in the corpus — the storage-dedup ratio a
    * 100 TB media store actually realizes.
    *
    * At 100 TB: ONE payload scan computes boundaries and chunk md5s
    * in a single kernel pass (payloads never leave their scan
    * partitions); everything downstream — the fp-count shuffle and
    * the fp-keyed join back — carries only (media_id, start, len, fp)
    * rows, ~36 bytes per ~64-byte chunk. The chunk frame is
    * checkpointed once so the two consumers (counts + join) cannot
    * re-run the payload scan. */
  def mediaCdcChunks(s: SparkSession, dir: String): DataFrame = {
    val chunks = media(s, dir).toDF()
      .select(col("media_id"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        explode(graft.functions.Hashing.cdcChunksCol(
          col("payload"), lit(M09Window), lit(M09Divisor))).as("c"))
      .select(col("media_id"), col("n_bytes"),
        col("c.start").as("start"), col("c.len").as("len"),
        col("c.fp").as("fp"))
      .localCheckpoint()
    val counts = chunks.groupBy("fp").agg(count(lit(1)).as("n_copies"))
    chunks.join(counts, Seq("fp"))
      .groupBy("media_id", "n_bytes")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(when(col("n_copies") > 1, col("len").cast("bigint"))
          .otherwise(0L)).as("shared_bytes"))
      .select(col("media_id"), col("n_bytes"), col("n_chunks"),
        col("n_shared_chunks"), col("shared_bytes"),
        TextOps.r4(col("shared_bytes").cast("double") /
          col("n_bytes").cast("double")).as("dup_frac"))
      .orderBy("media_id")
  }

  /** m13 scene-cut constants — single-sourced into both dialect
    * replays. Window = bytes per frame signature; CutDelta = the L1
    * histogram-distance threshold (range [0, 2·Window]) above which a
    * frame starts a new scene. */
  val M13Window: Int = 64
  val M13CutDelta: Long = 24L

  /** m13: scene-cut detection over sampled video frames — the shot
    * segmentation a video-training pipeline runs before captioning or
    * keyframe extraction: sample a frame every `stepMs` (m02's
    * generator), compute each frame's content signature, and mark a
    * cut wherever consecutive signatures' L1 distance exceeds
    * [[M13CutDelta]] (the classic histogram-difference shot-boundary
    * detector, Zhang/Kankanhalli/Smoliar, Multimedia Systems 1993).
    * The DECODE STUB stands in for "decode frame at t → pixel
    * histogram": the signature is the codegen'd 16-bin nibble
    * histogram of the [[M13Window]] payload bytes at the frame's byte
    * offset (durationMs maps 10 ms → 1 byte in the synthetic media
    * table, so the offset arithmetic is exact); swap a real
    * frame-decode kernel in and ONLY the signature expression moves —
    * the explode, the lag, the threshold, and every plan shape stay.
    *
    * At 100 TB: signatures are computed IN THE SCAN STAGE (explode +
    * slice + histogram in one whole-stage-codegen span — payloads
    * never shuffle); the per-video lag window shuffles only
    * (media_id, frame_idx, 16 longs) ≈ 150 bytes/frame, and videos
    * are independent partitions of the window key. Integer-exact end
    * to end: byte counts, one subtraction chain — oracle-exact in
    * both dialects. */
  def sceneCuts(s: SparkSession, dir: String, stepMs: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExprs.nibbleHistogram
    val fr = media(s, dir).toDF()
      .filter(col("kind") === "video" && col("meta.durationMs") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), col("meta.durationMs").cast("bigint") - 1,
          lit(stepMs.toLong))).as("off_ms"))
      .select(col("media_id"),
        (col("off_ms") / stepMs).cast("bigint").as("frame_idx"),
        nibbleHistogram(col("payload").substr(
          (col("off_ms") / 10).cast("int") + lit(1), lit(M13Window)))
          .as("h"))
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    val lagged = fr.withColumn("p", lag(col("h"), 1).over(w))
      .filter(col("p").isNotNull)
    // 16 unrolled |h_i − p_i| terms — plain codegen'd projections
    // (the HOF zip_with/aggregate pair is CodegenFallback; 16 fixed
    // bins don't need it)
    val delta = (0 until 16).map(i =>
      abs(element_at(col("h"), i + 1) - element_at(col("p"), i + 1)))
      .reduce(_ + _)
    lagged.select(col("media_id"), col("frame_idx"), delta.as("delta"))
      .withColumn("is_cut", col("delta") > M13CutDelta)
      .orderBy("media_id", "frame_idx")
  }

  def mediaDupClusters(s: SparkSession, dir: String): DataFrame = {
    val levels = (0 until 16).map { i =>
      expr(s"(8 * element_at(h, ${i + 1})) div n").cast("string")
    }
    media(s, dir).toDF()
      .select(col("media_id"),
        length(col("payload")).as("n"),
        graft.functions.VectorExprs.nibbleHistogram(col("payload")).as("h"))
      .select(col("media_id"), concat_ws("-", levels: _*).as("sig"))
      .groupBy("sig")
      .agg(min("media_id").as("keeper"), count(lit(1)).as("n_members"))
      .select("sig", "keeper", "n_members")
      .orderBy("keeper")
  }

  /** m10's bucket inventory — single-sourced into the oracle replay's
    * VALUES list. (bucket_id, width, height): near-constant area with
    * aspect ratios spanning 0.42–2.4, the SDXL-style fixed grid. */
  val M10Buckets: Seq[(Int, Int, Int)] = Seq(
    (0, 64, 64), (1, 80, 48), (2, 48, 80), (3, 96, 40), (4, 40, 96))

  /** m10: aspect-ratio bucketing — the batch-shape assignment an image
    * training pipeline runs so each batch holds same-shaped tensors
    * (the SDXL/NovelAI bucketing scheme): every image goes to the
    * bucket minimizing |ln(aspect) − ln(bucket aspect)|, then the
    * resize-and-center-crop dims are derived so the SHORT side exactly
    * fills the bucket (cover semantics — no letterboxing, minimal
    * crop). METADATA-ONLY: the payload column is never touched; at
    * 100 TB this plans as one slim scan of (media_id, width, height)
    * against a broadcast 5-row bucket table.
    *
    * Engine-exact by construction: the aspect distance compares
    * `ln((w·bh)/(h·bw))` of INTEGER products floored at 6 dp (ties to
    * the lower bucket_id), and the resize dims are pure integer
    * arithmetic (`floor(w·bh/h)`), so the oracle replays every row
    * bit-identically. */
  /** m11 batch size — single-sourced into the oracle replay. */
  val M11BatchSize: Int = 4

  /** m11: the DATALOADER MANIFEST over m10's buckets — same-shaped
    * assets grouped into fixed-size training batches (what an image
    * trainer's sampler actually consumes): within each aspect bucket,
    * assets order deterministically by id and chunk into batches of
    * [[M11BatchSize]]; `full` marks complete batches (the
    * drop_last=True set) while partial tails stay visible for the
    * drop_last=False consumer. Composes m10 unchanged — metadata-only,
    * one window pass per bucket, no payload touch. */
  def batchManifest(s: SparkSession, dir: String,
                    batchSize: Int = M11BatchSize): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy("bucket_id").orderBy("media_id")
    val counts = Window.partitionBy("bucket_id", "batch_idx")
    aspectBuckets(s, dir)
      .select(col("media_id"), col("bucket_id"))
      .withColumn("rn", row_number().over(byBucket))
      .withColumn("batch_idx",
        floor((col("rn") - 1) / lit(batchSize.toDouble)).cast("int"))
      .withColumn("slot", ((col("rn") - 1) % batchSize).cast("int"))
      .withColumn("full", count(lit(1)).over(counts) === batchSize)
      .select("bucket_id", "batch_idx", "slot", "media_id", "full")
      .orderBy("bucket_id", "batch_idx", "slot")
  }

  def aspectBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = s.createDataFrame(M10Buckets).toDF("bucket_id", "bw", "bh")
    val dims = media(s, dir).toDF()
      .select(col("media_id"),
        col("meta.width").cast("long").as("w"),
        col("meta.height").cast("long").as("h"))
    val dist = floor(abs(log((col("w") * col("bh")).cast("double") /
      (col("h") * col("bw")).cast("double"))) * 1e6 + 0.5) / 1e6
    val wider = col("w") * col("bh") >= col("h") * col("bw")
    val rW = when(wider, floor(col("w") * col("bh") / col("h")))
      .otherwise(col("bw")).cast("int")
    val rH = when(wider, col("bh"))
      .otherwise(floor(col("h") * col("bw") / col("w"))).cast("int")
    val byDist = Window.partitionBy("media_id")
      .orderBy(col("dist").asc, col("bucket_id").asc)
    dims.crossJoin(broadcast(buckets))
      .withColumn("dist", dist)
      .withColumn("rk", row_number().over(byDist))
      .where(col("rk") === 1)
      .select(col("media_id"), col("bucket_id"),
        col("bw").as("bucket_w"), col("bh").as("bucket_h"),
        rW.as("resize_w"), rH.as("resize_h"),
        (rW - col("bw")).cast("int").as("crop_x"),
        (rH - col("bh")).cast("int").as("crop_y"))
      .orderBy("media_id")
  }

  /** s35's dials — single-sourced into the generated replays (the
    * d15/s18 fixture discipline). */
  val S35NQueries: Int = 3
  val S35NCand: Int = 20
  val S35K: Int = 3

  /** m14 dials — single-sourced into both dialect replays. AlignMin
    * sits near the measured self-pair score median (0.117 at sf0.01,
    * range [−0.40, 0.42]) so keep and drop are both populated at
    * every SF; HistBins is width-0.1 bins over cosine's [−1, 1]. */
  val M14AlignMin: Double = 0.1
  val M14HistBins: Int = 20

  /** The pinned 16×16 text→media projection — the learned CLIP
    * alignment's stand-in, a deterministic closed form both engines
    * replay verbatim (the s31-weights / [[Pinned]] fixture
    * discipline). Entries are exact multiples of 1/8, so every
    * projected component is exact in binary floating point and the
    * sign/mean comparisons below are engine-portable. */
  lazy val s35Projection: Array[Array[Double]] =
    Array.tabulate(16, 16)((i, j) => (((5 * i + 11 * j + 3) % 17) - 8) / 8.0)

  /** The centered sign signature for a 16-dim feature vector: bit i is
    * set iff v[i] exceeds the vector's own mean. Raw histograms are
    * non-negative, so s26's sign-of-component packing would emit
    * near-all-ones signatures (Hamming-useless); centering splits the
    * bits ~evenly. Mean = sum/16 is an exact binary division, so the
    * comparison replays exactly in both engines. */
  private def centeredSig(vc: Column): Column = {
    val mean = aggregate(vc, lit(0.0), (acc, x) => acc + x) / lit(16.0)
    aggregate(
      transform(sequence(lit(0), lit(15)),
        i => when(get(vc, i) > mean,
          pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** s35: CROSS-MODAL retrieval — a TEXT query finds its nearest MEDIA
    * objects, the CLIP-shaped serve path every multimodal training
    * pipeline ends at ("which images match this caption?"), with the
    * learned towers stood in by deterministic fixtures and every piece
    * of the Spark serving plumbing real:
    *
    *  - media tower: m07's 16-bin nibble histogram over the payload
    *    bytes (the codegen'd scan kernel — payloads never shuffle);
    *  - text tower: a 16-bin token-hash histogram (bucket = first md5
    *    hex digit), projected into the media feature space by the
    *    pinned [[s35Projection]] matrix — the alignment a trained
    *    two-tower model would provide;
    *  - serve: s26's two-stage machinery — centered-sign signatures,
    *    Hamming shortlist of [[S35NCand]] via the map-side
    *    TopKPerGroup heap, exact cosine re-rank of the shortlist only.
    *
    * Self-retrieval is kept (text finding its own document's payload
    * is the ground-truth pair, as in CLIP eval). At 100 TB: the media
    * corpus contributes one 8-byte signature per object to the
    * shortlist pass (the histogram/signature is computed in the scan),
    * queries broadcast, and only [[S35NCand]] payload-feature rows per
    * query are fetched for the re-rank — corpus cost is one linear
    * signature stream, exactly s26's serving economics. */
  def crossModalRetrieve(s: SparkSession, dir: String,
                         nQueries: Int = S35NQueries, k: Int = S35K,
                         nCand: Int = S35NCand): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExprs.{dot, nibbleHistogram}
    val m = media(s, dir).toDF()
      .select(col("media_id"),
        transform(nibbleHistogram(col("payload")), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // text tower over the query docs: 16-bin token-hash histogram,
    // then the pinned projection (16 codegen dots against plan-literal
    // matrix columns - the s05 centroid-assignment shape)
    val toks = split(trim(col("text")), "\\s+")
    val tq = transform(sequence(lit(0), lit(15)),
      b => size(filter(toks,
        tk => conv(substring(md5(tk), 1, 1), 16, 10).cast("int") === b))
        .cast("double"))
    val wCols = s35Projection.transpose
    val pj = array(wCols.map(cj => dot(col("tq"), typedlit(cj.toSeq))): _*)
    val q = t(s, dir, "documents").filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), tq.as("tq"))
      .select(col("q_id"), pj.as("pj"))
      .withColumn("q_nrm", sqrt(dot(col("pj"), col("pj"))))
      .localCheckpoint() // nQueries rows; feeds the sig AND re-rank fetches
    val ham = m.select(col("media_id"), centeredSig(col("v")).as("sig"))
      .crossJoin(broadcast(
        q.select(col("q_id"), centeredSig(col("pj")).as("q_sig"))))
      .select(col("q_id"), col("media_id"),
        bit_count(col("sig").bitwiseXOR(col("q_sig"))).cast("int")
          .as("hamming"))
    val cands = graft.plans.TopKPerGroup.topKPerGroup(
      ham, Seq("q_id"), Seq(("hamming", true), ("media_id", true)), nCand)
    val rer = m.join(broadcast(cands), "media_id")
      .join(broadcast(q.select(col("q_id"), col("pj"), col("q_nrm"))), "q_id")
      .select(col("q_id"), col("media_id"), col("hamming"),
        round(dot(col("pj"), col("v")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("media_id"))
    rer.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "media_id", "hamming", "cos")
      .orderBy("q_id", "rk")
  }

  /** The m14 per-pair alignment frame: each (media, caption) pair
    * scored by the s35 two towers — media = m07's nibble histogram
    * over the payload, caption = the token-hash histogram pushed
    * through the pinned [[s35Projection]] — as raw cosine. The pair
    * is media_id = doc_id: the caption rides IN the media row (the
    * LAION/webdataset shape — image and caption arrive together), so
    * both towers are computed in ONE scan projection and NO exchange
    * ever sees the payload or the text; with a physically separate
    * caption table this becomes one narrow id-keyed equi-join of
    * 16-double feature rows, payloads still scan-local. */
  private def alignmentPairs(s: SparkSession, dir: String): DataFrame =
    // fan = false: m14's law is that no exchange sees payload OR text
    // (both towers in one scan projection) — keep the read unfanned.
    alignmentPairsFrame(t(s, dir, "documents", fan = false))

  private[graft] def alignmentPairsFrame(docs: DataFrame): DataFrame = {
    import graft.functions.VectorExprs.{dot, nibbleHistogram}
    // empty tokens are NOT tokens: split(trim("")) yields [""] in both
    // engines — filtered here (and in the oracle's m14 qt CTE) so a
    // whitespace-only caption has an EMPTY token set, not one
    // md5("")-bucket count (the ADVICE r16 degenerate-doc alignment)
    val toks = filter(split(trim(col("text")), "\\s+"),
      tk => length(tk) > 0)
    // ONE md5 per token (bucket ids first, then a histogram fold) —
    // s35's per-bucket filter form hashes every token 16× (fine for
    // its 3 query docs, a 16× corpus-scan tax here: measured
    // 5.7 → 1.5 s at sf0.1); the counts are exact integers either
    // way, so the oracle keeps the filter spelling
    val bks = transform(toks,
      tk => conv(substring(md5(tk), 1, 1), 16, 10).cast("int"))
    val tq = aggregate(bks, typedlit(Seq.fill(16)(0.0)),
      (acc, x) => transform(acc, (v, i) => when(i === x, v + 1.0).otherwise(v)))
    val wCols = s35Projection.transpose
    val pj = array(wCols.map(cj => dot(col("tq"), typedlit(cj.toSeq))): _*)
    docs
      .select(col("doc_id").as("media_id"), col("source"),
        transform(nibbleHistogram(col("text").cast("binary")),
          _.cast("double")).as("v"),
        tq.as("tq"))
      .select(col("media_id"), col("source"), col("v"), pj.as("pj"))
      // zero-norm guard: an empty payload (zero media histogram) or a
      // token set whose projection collapses to the origin has no
      // direction — cos is DEFINED as 0 there (keep=false at any
      // positive gate), instead of Spark NaN / DuckDB div-by-zero
      // diverging on degenerate docs (the x25 avail=0 lesson; the
      // oracle replays the same CASE)
      .select(col("media_id"), col("source"),
        when(dot(col("pj"), col("pj")) > 0 && dot(col("v"), col("v")) > 0,
          round(dot(col("pj"), col("v")) /
              (sqrt(dot(col("pj"), col("pj"))) * sqrt(dot(col("v"), col("v")))),
            6))
          .otherwise(lit(0.0)).as("cos"))
  }

  /** m15: AUDIO spectral-stub features — the audio member the media
    * table's `kind` axis has cycled since m01 but no feature ever
    * exercised (the r16 stretch): a deterministic spectrogram stand-in
    * in the m07/m13 decode-stub discipline. "Frequency band" = the
    * byte's LOW nibble (the high-nibble histogram is m07's image
    * feature — the two axes are independent), "time frame" = payload
    * half, so the stub has the two axes a real spectrogram has, and
    * every derived quantity is integer-exact and hex-replayable in
    * DuckDB:
    *
    *  - `centroid_milli`: the spectral centroid Σ b·count(b) · 1000
    *    div n_bytes — the brightness dial an audio curation gate
    *    thresholds on;
    *  - `flux`: Σ_b |half1(b) − half2(b)| — the frame-to-frame
    *    spectral change, 0 iff the halves have identical band mass
    *    (the silence/stationarity detector).
    *
    * Swap the nibble kernels for a real STFT (a pandas-UDF batch over
    * mapInPandas in a codec-bearing container) and nothing else in the
    * plan moves — the m07 promise, kept on the audio axis. At 100 TB:
    * ONE scan projection (two codegen'd nibble kernels + integer
    * folds), no join, no exchange ever sees the payload (the m13
    * plan-gate law), report rows are (id, 3 ints). */
  def audioSpectralReport(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.lowNibbleHistogram
    val m = media(s, dir).toDF().filter(col("kind") === "audio")
    val withH = m.select(col("media_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      lowNibbleHistogram(
        expr("substring(payload, 1, length(payload) div 2)")).as("h1"),
      lowNibbleHistogram(expr(
        "substring(payload, length(payload) div 2 + 1, " +
          "length(payload) - length(payload) div 2)")).as("h2"))
    val tot = zip_with(col("h1"), col("h2"), (a, b) => a + b)
    val wsum = aggregate(
      zip_with(tot, sequence(lit(0L), lit(15L)), (c, b) => c * b),
      lit(0L), (acc, x) => acc + x)
    val flux = aggregate(
      zip_with(col("h1"), col("h2"), (a, b) => abs(a - b)),
      lit(0L), (acc, x) => acc + x)
    withH
      .select(col("media_id"), col("n_bytes"), wsum.as("wsum"),
        flux.as("flux"))
      .select(col("media_id"), col("n_bytes"),
        when(col("n_bytes") === 0L, 0L)
          .otherwise(expr("wsum * 1000 div n_bytes")).as("centroid_milli"),
        col("flux"))
      .orderBy("media_id")
  }

  /** m14: image-text alignment gate — the LAION-400M curation core:
    * score every (media, caption) pair with the two-tower (CLIP-
    * shaped) alignment cosine and keep pairs above [[M14AlignMin]].
    * s35 RETRIEVES with these towers; this is the other half a
    * multimodal data pipeline runs first — the per-pair keep/drop
    * that decides which pairs enter training at all. Towers are the
    * s35 fixtures (deterministic stand-ins for the learned encoders;
    * swap in real towers and nothing else in the plan moves).
    *
    * At 100 TB: one media-corpus scan (features + cosine computed in
    * the scan projection), no join, no shuffle but the presentation
    * sort — the same economics as m07's histogram pass. The binary
    * payload never leaves the scan stage (the m13 plan-gate law,
    * extended to this query). */
  def alignmentGate(s: SparkSession, dir: String,
                    minCos: Double = M14AlignMin): DataFrame =
    alignmentPairs(s, dir)
      .withColumn("keep", col("cos") >= minCos)
      .orderBy("media_id")

  /** m14h: the per-source alignment histogram — the release-gate
    * governance view of m14 (what fraction of each source's pairs
    * survive the gate, and how the alignment mass is distributed):
    * width-0.1 cosine bins × source, with per-bin pair and keep
    * counts. Report is (n_sources × [[M14HistBins]])-row — corpus
    * mass reduces in one count shuffle over slim (source, bin) keys. */
  def alignmentHistogram(s: SparkSession, dir: String,
                         minCos: Double = M14AlignMin,
                         bins: Int = M14HistBins): DataFrame =
    alignmentPairs(s, dir)
      .select(col("source"),
        least(lit(bins - 1),
          floor((col("cos") + lit(1.0)) * lit(bins / 2.0))).cast("int")
          .as("bin"),
        (col("cos") >= minCos).cast("long").as("kept"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n"), sum("kept").as("n_keep"))
      .orderBy("source", "bin")
}
