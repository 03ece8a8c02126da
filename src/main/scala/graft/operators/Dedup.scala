package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design notes (local[32] tests verify correctness only):
  *  - exact dedup: one hash-shuffle on the 16-byte fingerprint, never on
  *    the document text itself.
  *  - MinHash-LSH: signatures are a codegen-free narrow map; candidate
  *    generation is a shuffle on (band, bandKey) buckets — pairs are only
  *    materialized inside a bucket, never via cross join.
  *  - shingle inverted index: explode on shingles joins doc-to-doc only
  *    through shared shingles; at 100 TB add a document-frequency cap on
  *    hot shingles (stopword shingles) to bound bucket skew.
  */
object Dedup {

  /** SplitMix64 — deterministic parameter stream for hash families.
    * Pure function of the index: the plan is identical across runs/JVMs. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val NumPerm = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerm / Bands

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
    * the smallest doc_id. The shuffle key is 16 bytes/doc regardless of
    * document size — this is the 100 TB-safe shape. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .select("fp", "keeper", "n_copies")
      .orderBy("keeper")

  /** Documents with distinct 3-shingle sets + MinHash signatures. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) >= 1)

  private def withSignature(docs: DataFrame): DataFrame = {
    // Hash family: xxhash64 seeded by the permutation index (ANSI-safe —
    // no modular multiply that could overflow LongType).
    val hashes = transform(col("sh"), sh => xxhash64(sh))
    val sig = array((0 until NumPerm).map { i =>
      array_min(transform(hashes, h => xxhash64(lit(i), h)))
    }: _*)
    docs.withColumn("sig", sig)
  }

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
  def minhashLsh(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame = {
    val docs = withSignature(docShingles(s, dir)).cache()
    val bandKeys = array((0 until Bands).map { j =>
      concat_ws(",",
        transform(slice(col("sig"), j * RowsPerBand + 1, RowsPerBand),
          x => x.cast("string")))
    }: _*)
    val banded = docs
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "key")))
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
    * |A∪B| = |A|+|B|-|A∩B|. No cross join; the join key is the shingle. */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame = {
    val docs = docShingles(s, dir)
    val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
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

  /** 64-bit SimHash near-duplicate pairs (rows-only check — the bit mix
    * depends on xxhash64, which the SQL oracle cannot reproduce).
    *
    * The signature is computed over the doc's distinct 3-word shingles
    * (raw tokens are useless on small shared vocabularies — every doc
    * collides): bit i is the sign of sum over shingles of ±1 according
    * to bit i of xxhash64(shingle). Candidates come from 4 16-bit chunk
    * buckets (pigeonhole: hamming <= 3 guarantees a shared chunk),
    * verified by exact hamming distance <= maxHamming. */
  def simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val th = transform(shingles(col("text")), sh => xxhash64(sh))
    val bits = array((0 until 64).map { i =>
      when(aggregate(th, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)) >= 0, 1).otherwise(0)
    }: _*)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), bits.as("bits"))
      .cache()
    val chunkKeys = array((0 until 4).map { j =>
      concat_ws("", transform(slice(col("bits"), j * 16 + 1, 16), _.cast("string")))
    }: _*)
    val banded = docs.select(col("doc_id"), posexplode(chunkKeys).as(Seq("chunk", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("bits").as("bits_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("bits").as("bits_b")), "doc_b")
      .withColumn("hamming",
        aggregate(zip_with(col("bits_a"), col("bits_b"),
          (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
