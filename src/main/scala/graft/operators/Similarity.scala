package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t
import graft.functions.VectorExprs.dot

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * Two tiers, mirroring what a 100 TB pipeline needs:
  *  - brute-force cosine top-k for a small query set: broadcast the
  *    queries, one narrow pass over the corpus — scales linearly, no
  *    shuffle of the corpus.
  *  - hyperplane-LSH bucketing for all-pairs / large query sets: shuffle
  *    on a 16-bit bucket key, exact re-rank inside buckets.
  *
  * All dot products go through [[graft.functions.DotProduct]] (a
  * codegen'd Catalyst expression); per-vector norms are computed ONCE
  * per row before any pair join, so the O(n²) inner loop is a single
  * tight codegen'd dot per pair.
  */
object Similarity {

  /** Cosine similarity over two array<double> columns, computed in
    * double with the same op order as `Σab / (√Σa² · √Σb²)`. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Embeddings with the L2 norm precomputed (`nrm` = √Σv²). Pair-level
    * cosine is then `dot / (nrm_a * nrm_b)` — bit-identical to
    * [[cosine]] since `√x·√y` is evaluated in the same order. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Brute-force cosine top-k: queries (vec_id < nQueries) broadcast
    * against the full corpus; rank per query. Deterministic: cosine is
    * rounded to 6 decimals before ranking, ties broken by vec_id. */
  def annBruteForce(s: SparkSession, dir: String,
                    nQueries: Int = 5, k: Int = 3): DataFrame = {
    val all = emb(s, dir)
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("q_nrm"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dot(col("qv"), col("v")) / (col("q_nrm") * col("nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** All-pairs near-duplicate embeddings above a cosine threshold —
    * brute force (corpus x corpus). Correct at any scale but O(n^2):
    * the oracle-checked exact baseline for [[lshPairs]]. */
  def cosinePairs(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val a = emb(s, dir).select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("nrm_a"))
    val b = emb(s, dir).select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** d07: near-duplicate CLUSTERS in embedding space — the cosine
    * variant of d05 dup-clustering: the exact pair baseline
    * ([[cosinePairs]], oracle-checked in s02) feeds the same
    * star-contraction connected components as the text path
    * ([[Dedup.dupClusters]]). Output: (vec_id, cluster) for every
    * vector in a near-dup pair, cluster = smallest member id. At
    * 100 TB swap the pair source for [[lshPairs]] — the CC stage is
    * pair-source-agnostic. */
  def embeddingClusters(s: SparkSession, dir: String,
                        threshold: Double = 0.4): DataFrame =
    Dedup.dupClusters(cosinePairs(s, dir, threshold)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster"))
      .orderBy("vec_id")

  /** Deterministic pseudo-random hyperplanes: planes(i)(d) in [-1, 1),
    * a pure function of (i, d) via SplitMix64 — identical across JVMs. */
  private def plane(i: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      val h = Dedup.splitmix64(i.toLong * 131071L + d)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** Sign-LSH bucket key: `nPlanes` hyperplane sign bits packed into a
    * string key. Vectors in the same bucket are candidate neighbors.
    * Each plane is ONE array literal (`typedlit`, not 64 scalar
    * literals) and the projection is the codegen'd dot product. */
  def lshBucket(v: Column, nPlanes: Int = 12, dim: Int = 64): Column =
    concat_ws("", (0 until nPlanes).map { i =>
      when(dot(v, typedlit(plane(i, dim))) >= 0, "1").otherwise("0")
    }: _*)

  /** LSH-bucketed near-neighbor pairs: shuffle on the bucket key, exact
    * cosine re-rank inside each bucket. The 100 TB path for all-pairs
    * similarity — recall is tunable via nPlanes (fewer planes = bigger
    * buckets = higher recall and cost). Rows-only check: bucketing
    * recall is probabilistic, there is no exact SQL oracle. */
  def lshPairs(s: SparkSession, dir: String, threshold: Double = 0.3,
               nPlanes: Int = 6): DataFrame = {
    val docs = emb(s, dir)
      .select(col("vec_id"), col("v"), col("nrm"),
        lshBucket(col("v"), nPlanes).as("bucket"))
    docs.as("a").join(docs.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Symmetric per-vector int8 quantization: q_i = half-up-round of
    * v_i·127/max|v|, values in [-127, 127] (kept in a double array so
    * the codegen'd DotProduct consumes them directly). At 100 TB this
    * is the memory lever for ANN: 4-8× smaller vectors in the shuffle
    * and in cache, with dot products that become EXACT integer sums
    * (< 2^53 — no float-order nondeterminism at all). floor(x+0.5) is
    * the engine-portable half-up round. */
  def quantizeInt8(v: Column): Column = {
    val m = array_max(transform(v, x => abs(x)))
    when(m > 0, transform(v, x => floor(x * lit(127.0) / m + lit(0.5))))
      .otherwise(v)
  }

  /** Brute-force ANN over int8-quantized embeddings — s01's shape with
    * quantized vectors and exact-integer dot products. Rankings agree
    * with the full-precision search except where neighbors are closer
    * than the quantization error (SimilaritySpec measures recall@k). */
  def annQuantized(s: SparkSession, dir: String,
                   nQueries: Int = 5, k: Int = 3): DataFrame = {
    val all = t(s, dir, "embeddings")
      .select(col("vec_id"), quantizeInt8(asDouble(col("embedding"))).as("qv"))
      .withColumn("nrm", sqrt(dot(col("qv"), col("qv"))))
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("qq"), col("nrm").as("q_nrm"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dot(col("qq"), col("qv")) / (col("q_nrm") * col("nrm")), 6).as("qcos"))
    val w = Window.partitionBy("q_id").orderBy(desc("qcos"), asc("n_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "qcos")
      .orderBy("q_id", "rk")
  }

  /** Per-label embedding centroids via the typed
    * [[graft.functions.CentroidAggregator]] UDAF: one (sums, count)
    * buffer per label per partition, so the shuffle carries k×dim
    * doubles per partition instead of the n×dim exploded rows the
    * declarative posexplode+avg formulation would move. Output is
    * exploded to (label, pos, c) rows only for the oracle compare. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.CentroidAggregator().toColumn
    emb(s, dir).select(col("label"), col("v")).as[(Int, Seq[Double])]
      .groupByKey(_._1)
      .agg(agg.name("centroid"))
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"), round(col("x"), 4).as("c"))
      .orderBy("label", "pos")
  }

  /** Per-label embedding statistics — array columns as first-class
    * aggregate inputs (norms via the codegen'd dot). */
  def labelNorms(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg(col("nrm")), 4).as("avg_norm"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"))
      .orderBy("label")

  /** Deterministic k-means coarse quantizer (Lloyd's, fixed iteration
    * count, init = first k vectors by vec_id). Centroids are driver-held
    * model state (k × dim doubles — bytes, not data); every data pass is
    * distributed: assignment is k codegen'd dots per row, the update is
    * a posexplode + (cluster, dim) average — one shuffle of k×dim
    * partial sums per iteration regardless of corpus size. */
  def fitCentroids(vecs: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var cents = vecs.orderBy("vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val sums = assignToCentroid(vecs, cents)
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c", "pos").agg(avg("x").as("m"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getAs[Int]("c"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      cents = next // empty clusters keep their previous centroid
    }
    cents
  }

  /** Nearest centroid by maximum dot product (use normalized vectors for
    * cosine). Ties break to the lowest centroid index (array_position
    * returns the first match). */
  private def assignToCentroid(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val dots = array(cents.map(c => dot(col("v"), typedlit(c.toSeq))): _*)
    vecs.withColumn("c",
      (array_position(dots, array_max(dots)) - 1).cast("int"))
  }

  /** The `p` centroid indices with the highest dot product against `v`,
    * best first (ties to the lower index): sort (dot, index) structs on
    * negated dot, slice, project the index back out — pure Column
    * expression, no UDF. */
  private def topCells(v: Column, cents: Array[Array[Double]], p: Int): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct((-dot(v, typedlit(c.toSeq))).as("nd"), lit(i).as("i"))
    }: _*)
    transform(slice(array_sort(scored), 1, p), s => s("i").cast("int"))
  }

  /** True IVF ANN: k-means coarse quantizer over L2-normalized
    * embeddings, probe the query's cell, exact cosine re-rank inside it.
    * The 100 TB shape: centroids broadcast implicitly as plan literals,
    * the corpus partitioned by cell, each query touches one cell
    * (nprobe=1 here; more cells = higher recall, linearly more work).
    * Rows-only check — recall is probabilistic, like s03/s04. */
  def annKmeansIvf(s: SparkSession, dir: String, nQueries: Int = 5,
                   k: Int = 3, nCent: Int = 8, iters: Int = 3,
                   nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCent, s"nprobe=$nprobe out of [1, $nCent]")
    val normed = emb(s, dir)
      .withColumn("nv", transform(col("v"), x => x / col("nrm")))
      .select(col("vec_id"), col("nv").as("v"))
      // localCheckpoint, not cache: read k-means-iters× during fitting +
      // twice in the final plan; blocks are freed on plan GC instead of
      // pinning a CacheManager entry per invocation
      .localCheckpoint()
    val cents = fitCentroids(normed, nCent, iters)
    val corpus = assignToCentroid(normed, cents)
    // each query probes its nprobe closest cells (nprobe=1 ≡ own cell);
    // recall and probe cost both scale linearly with nprobe
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(topCells(col("v"), cents, nprobe)).as("c"))
    val scored = corpus.join(broadcast(queries), Seq("c"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dot(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** IVF-style search: assign every vector to its LSH bucket (the
    * "inverted file"), probe only the query's bucket, exact re-rank.
    * Demonstrates the coarse-quantize → probe → re-rank shape; the
    * k-means coarse quantizer variant is [[annKmeansIvf]]. */
  def annIvf(s: SparkSession, dir: String,
             nQueries: Int = 5, k: Int = 3, nPlanes: Int = 4): DataFrame = {
    val all = emb(s, dir)
      .select(col("vec_id"), col("v"), col("nrm"),
        lshBucket(col("v"), nPlanes).as("bucket"))
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("q_nrm"), col("bucket"))
    val scored = all.join(broadcast(queries),
        Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dot(col("qv"), col("v")) / (col("q_nrm") * col("nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }
}
