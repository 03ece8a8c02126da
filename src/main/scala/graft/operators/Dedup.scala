package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Hashing

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design notes (local[32] tests verify correctness only):
  *  - exact dedup: one hash-shuffle on the 16-byte fingerprint, never on
  *    the document text itself.
  *  - MinHash-LSH: signatures are one single-pass JVM kernel per doc
  *    (graft.functions.Hashing); candidate generation is a shuffle on
  *    (band, 8-byte bandKey) buckets — pairs are only materialized
  *    inside a bucket, never via cross join.
  *  - shingle inverted index: shingles are xxhash64'd to 8-byte longs
  *    BEFORE the explode + self-join, so the shuffle carries longs, not
  *    3-word strings; at 100 TB add a document-frequency cap on hot
  *    shingles (stopword shingles) to bound bucket skew.
  */
object Dedup {

  /** Deterministic parameter stream for hash families — see
    * [[graft.functions.Hashing.splitmix64]]. */
  def splitmix64(seed: Long): Long = Hashing.splitmix64(seed)

  private def tokensOf(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct 3-word shingles of a text column (docs with <3 tokens have
    * no shingles and drop out of near-dup analysis). Guarded: Spark's
    * sequence(1, 0) counts DOWN, so short docs need an explicit branch. */
  def shingles(c: Column, n: Int = 3): Column = {
    val tk = tokensOf(c)
    when(size(tk) >= n,
      array_distinct(
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group on the md5 fingerprint of normalized text, keep
    * the smallest id. The shuffle key is 16 bytes/doc regardless of
    * document size — this is the 100 TB-safe shape. Generic core:
    * any (id, text) frame. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        md5(lower(regexp_replace(trim(col(textCol)), "\\s+", " "))).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"))
      .select("fp", "keeper", "n_copies")
      .orderBy("keeper")

  def exactDedup(s: SparkSession, dir: String): DataFrame =
    exactDedup(t(s, dir, "documents"), "doc_id", "text")

  /** Documents with their distinct HASHED 3-shingle sets (docs with none
    * drop out). One single-pass JVM kernel per document — see
    * [[graft.functions.Hashing.shingleHashes]]; every sketch below
    * consumes the 8-byte hashes, never shingle strings. Set sizes and
    * intersections are identical to the string-shingle formulation
    * modulo 64-bit collisions (negligible at feasible corpus sizes). */
  private[operators] def docShingles(docs: DataFrame, idCol: String,
                                     textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), Hashing.hashedShingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) >= 1)

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    docShingles(t(s, dir, "documents"), "doc_id", "text")

  /** Exact Jaccard over the shingle sets of a candidate-pair frame with
    * columns (doc_a, doc_b, sh_a, sh_b). */
  private def jaccardOf(pairs: DataFrame): DataFrame = {
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    pairs.withColumn("jaccard",
      round(inter.cast("double") / uni.cast("double"), 4))
  }

  /** MinHash + LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * 64 permutations banded 16x4: a pair at Jaccard j collides in >=1
    * band with prob 1-(1-j^4)^16 (≈1 for j>=0.85). Candidates from band
    * buckets only (shuffle on band keys — no cross join), then exact
    * Jaccard >= threshold filters false positives, so the result equals
    * the exact-Jaccard oracle whenever true pairs sit well above the
    * LSH recall knee — which is the regime dedup runs in. */
  def minhashLsh(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame =
    minhashLsh(t(s, dir, "documents"), "doc_id", "text", threshold)

  def minhashLsh(docsIn: DataFrame, idCol: String, textCol: String,
                 threshold: Double): DataFrame = {
    // localCheckpoint (eager, MEMORY_AND_DISK): the frame is read three
    // times inside this one query plan. Unlike cache(), the blocks are
    // released by ContextCleaner as soon as the returned plan is GC'd —
    // no CacheManager entry accumulates across invocations in a
    // long-lived session. (Tradeoff: on a real cluster a lost executor
    // loses the non-replicated blocks and fails the query instead of
    // recomputing; acceptable for a frame this narrow.)
    val docs = docShingles(docsIn, idCol, textCol)
      .withColumn("bands", Hashing.minhashBands(col("sh")))
      .localCheckpoint()
    val banded = docs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    jaccardOf(withSets)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram-Jaccard near-dup pairs via a shingle inverted index:
    * explode shingles, self-join on the shingle, count shared shingles
    * per pair (= intersection; shingle sets are distinct per doc), then
    * |A∪B| = |A|+|B|-|A∩B|. No cross join; the join key is the
    * xxhash64 of the shingle — 8 bytes through the shuffle instead of a
    * 3-word string (64-bit collisions are negligible at any corpus size
    * this query's exact-pairs output is feasible for). */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame =
    ngramJaccard(t(s, dir, "documents"), "doc_id", "text", threshold)

  def ngramJaccard(docsIn: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val docs = docShingles(docsIn, idCol, textCol)
    // localCheckpoint: both sides of the self-join read this frame — one
    // materialization instead of running the shingle kernel twice
    // (blocks auto-released on plan GC, see minhashLsh note)
    val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
      .localCheckpoint()
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", round(
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram Jaccard with a document-frequency cap on shingles — the
    * skew mitigation the plain inverted index needs at 100 TB: a
    * stopword shingle with df=10⁶ contributes 10¹² pairs to the
    * self-join; capping df bounds every shingle's pair contribution to
    * cap² at the cost of slightly under-counting intersections for
    * pairs that only share hot shingles. Denominators count the CAPPED
    * shingle sets, so the score stays a true Jaccard of the filtered
    * sets (and the DuckDB oracle reproduces it exactly). */
  def cappedNgramJaccard(s: SparkSession, dir: String, threshold: Double = 0.7,
                         dfCap: Int = 50): DataFrame =
    cappedNgramJaccard(t(s, dir, "documents"), "doc_id", "text", threshold, dfCap)

  def cappedNgramJaccard(docsIn: DataFrame, idCol: String, textCol: String,
                         threshold: Double, dfCap: Int): DataFrame = {
    val ex = docShingles(docsIn, idCol, textCol)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val rare = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select("shingle")
    val kept = ex.join(rare, "shingle")
    val sized = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // both sides of the self-join read this — materialize once
    // (blocks auto-released on plan GC, see minhashLsh note)
    val exKept = kept.join(sized, "doc_id").localCheckpoint()
    val inter = exKept.as("a").join(exKept.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", round(
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Near-duplicate CLUSTERS: connected components over the
    * jaccard>=threshold pair graph, labeled by the smallest doc_id in
    * each component — the step that turns pairwise dedup output into
    * "keep one per group".
    *
    * Iterative min-label propagation: each round every node takes the
    * min of its own label and its neighbors'; converges in <= graph
    * diameter rounds (dup clusters are near-cliques, so 2-3 rounds in
    * practice). Each round is one equi-join + one aggregate — all
    * shuffles are on the node id; `localCheckpoint` truncates lineage so
    * plans don't grow across iterations. At extreme graph sizes swap in
    * the large-star/small-star variant (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — same join shape. */
  def dupClusters(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame =
    dupClusters(ngramJaccard(s, dir, threshold))

  /** Generic core over any (doc_a, doc_b) near-dup pair frame. */
  def dupClusters(pairFrame: DataFrame): DataFrame = {
    val pairs = pairFrame.select("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst").localCheckpoint()
    var labels = edges.select(col("src").as("n")).distinct()
      .withColumn("lbl", col("n")).localCheckpoint()
    // labels only ever decrease, so the label sum is a strictly
    // decreasing potential: unchanged sum ⇔ fixpoint. One scalar
    // aggregate per iteration instead of a join-based diff.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).collect()(0).getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.select(col("n").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("n")).agg(min("lbl").as("nmin"))
      val updated = labels.join(neighborMin, Seq("n"), "left")
        .select(col("n"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val newSum = labelSum(updated)
      converged = newSum == prevSum
      prevSum = newSum
      labels = updated
    }
    labels.select(col("n").as("doc_id"), col("lbl").as("cluster"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag TRAIN documents sharing any 3-word
    * shingle with the TEST split — the published LLM-corpus hygiene step
    * (GPT-3 appendix C / PaLM-style n-gram collision removal), here with
    * the library's own deterministic md5 split standing in for the
    * benchmark set.
    *
    * Shape at 100 TB: the benchmark shingle set is tiny by construction
    * (benchmarks are MBs, corpora are TBs), so it BROADCASTS — the train
    * side stays a narrow explode→broadcast-semi-join→re-aggregate with
    * no all-to-all shuffle of corpus shingles. Shingles travel as 8-byte
    * hashes (see [[graft.functions.Hashing.hashedShingles]]), never as
    * strings. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = Sampling.deterministicSplit(docShingles(s, dir), "doc_id")
    decontaminate(
      sh.filter(col("split") === "train"),
      sh.filter(col("split") === "test"))
  }

  /** Generic core: corpus vs an explicit benchmark frame, both already
    * shingled to (doc_id, sh) — see [[docShingles]]. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    val testSh = benchmark
      .select(explode(col("sh")).as("shingle")).distinct()
    val train = corpus
      .select(col("doc_id"), size(col("sh")).cast("bigint").as("n_shingles"),
        explode(col("sh")).as("shingle"))
    // shingles are distinct within a doc, so count(*) = |doc ∩ benchmark|
    train.join(broadcast(testSh), "shingle")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_contaminated"), col("n_shingles"),
        TextOps.r4(col("n_contaminated").cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash near-duplicate pairs (rows-only check — the bit mix
    * depends on xxhash64, which the SQL oracle cannot reproduce).
    *
    * The signature is computed over the doc's distinct 3-word shingles
    * (raw tokens are useless on small shared vocabularies — every doc
    * collides): bit i is the sign of sum over shingles of ±1 according
    * to bit i of xxhash64(shingle). Candidates come from 4 16-bit chunk
    * buckets (pigeonhole: hamming <= 3 guarantees a shared chunk),
    * verified by exact hamming distance <= maxHamming. */
  def simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhash(t(s, dir, "documents"), "doc_id", "text", maxHamming)

  def simhash(docsIn: DataFrame, idCol: String, textCol: String,
              maxHamming: Int): DataFrame = {
    // 4 chunks pigeonhole-guarantee a shared chunk only for hamming <= 3;
    // a larger radius needs more chunks or multi-chunk probing
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-chunk candidate guarantee (max 3)")
    val docs = docShingles(docsIn, idCol, textCol)
      .select(col("doc_id"), Hashing.simhash(col("sh")).as("sig"))
      .localCheckpoint() // read 3× in-plan; blocks auto-released (see minhashLsh)
    // 4 chunks of 16 bits each; bit i of the signature = bit i of `sig`,
    // so chunk j is just a shift+mask — no per-bit array materializes.
    val chunkKeys = array((0 until 4).map { j =>
      shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL))
    }: _*)
    val banded = docs.select(col("doc_id"), posexplode(chunkKeys).as(Seq("chunk", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
