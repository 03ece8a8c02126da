package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** End-to-end corpus curation: the composition a training-data user
  * actually runs — quality filter → exact dedup → train/val/test split
  * — chained from the library's own operators, reported as a funnel of
  * counts per stage. Every stage is a narrow transform or a single
  * hash-shuffle; the funnel is what you'd watch in production to catch
  * a filter suddenly eating the corpus. */
object Curation {

  def curationFunnel(s: SparkSession, dir: String,
                     qualityMin: Double = 0.5): DataFrame = {
    val quality = TextOps.qualityScore(s, dir).select(col("doc_id"), col("quality"))
    // localCheckpoint: the funnel's four count branches all re-read this
    // subtree; blocks are auto-released when the returned plan is GC'd
    // (cache() entries would accumulate across invocations)
    val docs = t(s, dir, "documents")
      .join(quality, "doc_id")
      .withColumn("fp",
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .localCheckpoint()
    val passing = docs.filter(col("quality") >= qualityMin)
    val keepers = passing.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val split = Sampling.deterministicSplit(keepers, "doc_id")

    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))

    stage("1_raw", docs)
      .unionByName(stage("2_quality_pass", passing))
      .unionByName(stage("3_dedup_keepers", keepers))
      .unionByName(
        split.groupBy("split").agg(count(lit(1)).as("n"))
          .select(concat(lit("4_"), col("split")).as("stage"), col("n")))
      .orderBy("stage")
  }

  /** x11: hashed-feature importance weights — the DSIR recipe
    * (Data Selection via Importance Resampling, arXiv:2302.03169):
    * score every document by how much more its token distribution
    * looks like a TARGET domain than the raw corpus, so a later
    * sampler can resample the crawl toward the target. Features are
    * hashed unigrams (md5 hex prefix → 256 buckets, the same
    * engine-portable bucketing as x03); per-bucket log-likelihood
    * ratios use add-0.5 smoothing; a document's weight is
    * Σ_f c_f · λ_f over its feature counts.
    *
    * Determinism at any scale: λ_f is rounded to MICROS (an int64)
    * before the per-doc sum, so the aggregation is pure integer
    * arithmetic — reassociable, partitioning-independent, and
    * oracle-exact — instead of a float sum whose value depends on
    * combine order. At 100 TB: one explode → bucket-count aggregate
    * (256 groups, conditional target count in the same pass), the
    * 256-row λ table broadcast, one (doc, bucket) aggregate, one
    * per-doc sum — no join ever carries the corpus on both sides. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    importanceWeights(t(s, dir, "documents"), "doc_id", "text",
      col("lang") === "en")

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val nBuckets = 256 // 2 hex digits; fixed so smoothing constants are literals
    val fb = docs
      .select(col(idCol), targetPred.as("is_target"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .select(col(idCol), col("is_target"),
        substring(md5(col("w")), 1, 2).as("f"))
    val buckets = fb.groupBy("f").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
    val tot = buckets.agg(
      sum("n_raw").cast("double").as("r_total"),
      sum("n_tgt").cast("double").as("t_total"))
    val lam = buckets.crossJoin(broadcast(tot))
      .select(col("f"),
        floor(log(
          ((col("n_tgt").cast("double") + lit(0.5)) /
            (col("t_total") + lit(0.5 * nBuckets))) /
          ((col("n_raw").cast("double") + lit(0.5)) /
            (col("r_total") + lit(0.5 * nBuckets)))) * lit(1e6) + lit(0.5))
          .cast("bigint").as("lam_micro"))
    val perDoc = fb.groupBy(col(idCol), col("f")).agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(lam), "f")
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * col("lam_micro")).as("weight_micro"))
      .orderBy(idCol)
  }

  /** Pinned micro-scaled linear weights over the 256 hashed-feature
    * buckets — a pure function of the bucket index (SplitMix64), the
    * fixture standing in for a TRAINED fastText/logistic-regression
    * quality model (the CCNet/GPT-3 quality-filter pass serves exactly
    * this artifact; swap in real trained weights and nothing else in
    * the plan moves — the Pinned-model discipline). Values in
    * [-1000, 1000] micros. */
  lazy val qualityModelMicro: Array[Long] =
    Array.tabulate(256) { b =>
      val h = Dedup.splitmix64(b.toLong * 2654435761L + 17L)
      ((h % 2001L) + 2001L) % 2001L - 1000L
    }

  /** x15: quality-classifier SERVING — score every document with a
    * linear model over hashed bag-of-words features (the fastText
    * recipe: f = md5-hex-prefix bucket, the x11/x03 engine-portable
    * bucketing; score = Σ_f c_f·w_f). This is the other half of the
    * x11 story: x11 ESTIMATES per-bucket log-ratios from data, x15
    * SERVES a fixed model at corpus scale — the pass that decides
    * keep/drop for every crawl document in the published pipelines.
    *
    * Determinism and scale: the weights ride in the plan as a 256-long
    * LITERAL array (`element_at` — no join, not even a broadcast), the
    * per-doc reduction is pure int64 micro arithmetic (reassociable ⇒
    * partitioning-independent), the keep verdict compares the INTEGER
    * sum against zero (no float boundary), and only the reported
    * per-token mean score is a float — one fixed-order division chain,
    * r4-floored. Cost at 100 TB: one explode + two hash aggregates —
    * scan-bound, no shuffle carries text. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    qualityClassifier(t(s, dir, "documents"), "doc_id", "text",
      qualityModelMicro)

  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                        wMicro: Array[Long]): DataFrame = {
    require(wMicro.length == 256, s"expected 256 weights, got ${wMicro.length}")
    val fb = docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .select(col(idCol),
        conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int").as("f"))
    fb.groupBy(col(idCol), col("f")).agg(count(lit(1)).as("c"))
      .select(col(idCol), col("c"),
        element_at(typedlit(wMicro.toSeq), col("f") + 1).as("wm"))
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * col("wm")).as("score_micro"))
      .withColumn("score", TextOps.r4(
        col("score_micro").cast("double") / lit(1e6) /
          col("n_tokens").cast("double")))
      .withColumn("keep", col("score_micro") > 0)
      .select(idCol, "n_tokens", "score_micro", "score", "keep")
      .orderBy(idCol)
  }

  /** x12: curriculum quality bins — order the corpus by the t02
    * quality score and cut it into `nBins` equal-population tiers (the
    * easy→hard schedule curriculum training consumes; also the
    * quantile view ablation studies slice on). The global rank is NOT
    * a single-task `Window.orderBy`: scores bucket by `floor(q·16)`
    * (a prefix of the sort order, since quality ∈ [0,1]), each bucket
    * ranks locally, and a broadcast 17-row offset table splices the
    * buckets into one exact global numbering — the x03/x10 two-phase
    * discipline applied to ranking, so the hot path is one window per
    * score-bucket at any corpus size. Ties rank by doc_id, so the
    * result is total-ordered and oracle-exact. */
  def curriculumBins(s: SparkSession, dir: String, nBins: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextOps.qualityScore(s, dir).select(col("doc_id"),
      col("quality").as("score"))
    val narrow = q.withColumn("bucket",
      floor(col("score") * lit(16)).cast("int"))
    val offsets = narrow.groupBy("bucket").agg(count(lit(1)).as("part_n"))
      .withColumn("offset", coalesce(
        sum("part_n").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val nTotal = narrow.agg(count(lit(1)).as("n_total"))
    val wLocal = Window.partitionBy("bucket")
      .orderBy(col("score").asc, col("doc_id").asc)
    narrow
      .withColumn("local_rk", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("bucket"))
      .crossJoin(broadcast(nTotal))
      .withColumn("rk", col("offset") + col("local_rk"))
      .select(col("doc_id"), col("score").as("quality"), col("rk"),
        expr(s"((rk - 1) * $nBins) div n_total").as("bin"))
      .orderBy("doc_id")
  }

  /** v06: dedup-impact report — the governance number a data lead
    * reads before signing off a corpus release: for each dedup family
    * the library ships, how many documents it would touch and how many
    * tokens it would remove. One row per stage, independent accounting
    * (the stages are alternative lenses on the same corpus, not a
    * sequential pipeline):
    *
    *  - `exact_dedup` (d01's rule): the non-keeper copies per
    *    content-fingerprint family; tokens = their full bodies;
    *  - `near_dedup` (d03→d05→d08's rule at τ=0.7): cluster members
    *    minus the keep-best keepers; tokens = the non-keepers' bodies;
    *  - `span_dedup` (t26's rule): documents with any duplicated-span
    *    coverage; tokens = total covered tokens (Lee et al.'s corpus
    *    duplication number — every occurrence counts, the upper bound
    *    a keep-first splice would approach).
    *
    * Every stage is a global aggregate (the q35 lesson: empty stages
    * still emit their 0 row). Scale: exact/span are the d01/t26 shapes
    * verbatim; near carries the documented d03 quadratic-oracle
    * contract — at 100 TB it runs over d10's LSH-sourced clusters
    * instead (same downstream accounting). */
  def dedupImpact(s: SparkSession, dir: String): DataFrame =
    dedupImpact(t(s, dir, "documents"), "doc_id", "text")

  def dedupImpact(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"),
        Sampling.contentFp(col(textCol)).as("fp"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"),
        col("n_chars"))
      .localCheckpoint() // feeds the exact stage AND the near join-back
    def staged(name: String, affected: Column, removed: Column,
               src: DataFrame): DataFrame =
      src.agg(coalesce(affected, lit(0L)).as("docs_affected"),
          coalesce(removed, lit(0L)).as("tokens_removed"))
        .select(lit(name).as("stage"), col("docs_affected"),
          col("tokens_removed"))
    val exact = staged("exact_dedup",
      sum(when(col("rk") > 1, 1L).otherwise(0L)),
      sum(when(col("rk") > 1, col("n_tokens")).otherwise(0L)),
      base.withColumn("rk", row_number().over(
        Window.partitionBy("fp").orderBy(asc("doc_id")))))
    // unordered pair frame: the CC checkpoint would materialize the
    // presentation sort nothing reads (the d07/d09 lesson)
    val clusters = Dedup.dupClusters(
      Dedup.ngramJaccardUnordered(docs, idCol, textCol, 0.7))
    val keepers = Dedup.keepBestFrom(clusters,
      base.select(col("doc_id"), col("n_chars")))
    val near = staged("near_dedup",
      sum(when(col("doc_id") =!= col("kept_doc_id"), 1L).otherwise(0L)),
      sum(when(col("doc_id") =!= col("kept_doc_id"), col("n_tokens"))
        .otherwise(0L)),
      clusters.join(keepers, "cluster").join(base, "doc_id"))
    val span = staged("span_dedup",
      sum(when(col("covered_tokens") > 0, 1L).otherwise(0L)),
      sum(col("covered_tokens")),
      TextOps.spanCoverage(docs, idCol, textCol))
    exact.unionByName(near).unionByName(span).orderBy("stage")
  }
}
