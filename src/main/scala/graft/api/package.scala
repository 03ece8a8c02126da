package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.{Checks, Curation, Dedup, Sampling, Skew, TemporalJoins, TextOps}

/** User-facing fluent API: `import graft.api._` and every corpus
  * operator hangs off any DataFrame with the right columns — the
  * switch-over surface for a user of the reference pipeline.
  *
  * {{{
  * import graft.api._
  * val docs = spark.read.parquet("corpus/")           // (doc_id, text, …)
  * docs.dedupExact("doc_id", "text")                  // exact dedup report
  * docs.dedupNearMinhash("doc_id", "text", 0.8)       // LSH near-dups
  * docs.scrubPii("doc_id", "text")                    // redaction stats
  * docs.splitDeterministic("doc_id")                  // +split column
  * clicks.asofJoin(purchases, "user_id", "ts", Seq("value"))
  * }}}
  *
  * Every method delegates to the operator objects (Dedup / TextOps /
  * Sampling / TemporalJoins / Skew); this file adds no semantics —
  * only discoverability.
  */
package object api {

  implicit class GraftDocumentOps(private val df: DataFrame) extends AnyVal {

    // ---- dedup ----
    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exactDedup(df, idCol, textCol)

    def dedupNearMinhash(idCol: String, textCol: String,
                         threshold: Double = 0.7): DataFrame =
      Dedup.minhashLsh(df, idCol, textCol, threshold)

    def dedupNearExact(idCol: String, textCol: String,
                       threshold: Double = 0.7): DataFrame =
      Dedup.ngramJaccard(df, idCol, textCol, threshold)

    def dedupNearSimhash(idCol: String, textCol: String,
                         maxHamming: Int = 3): DataFrame =
      Dedup.simhash(df, idCol, textCol, maxHamming)

    /** Connected components over a near-dup pair frame
      * (`doc_a`,`doc_b` columns, e.g. [[dedupNearMinhash]] output) →
      * (doc_id, cluster) labels, cluster = smallest member id. */
    def dupClusters(): DataFrame = Dedup.dupClusters(df)

    // ---- text analysis ----
    def textTokenCounts(idCol: String, textCol: String): DataFrame =
      TextOps.tokenCounts(df, idCol, textCol)

    def textQuality(idCol: String, textCol: String): DataFrame =
      TextOps.qualityScore(df, idCol, textCol)

    def textRepetition(idCol: String, textCol: String): DataFrame =
      TextOps.repetition(df, idCol, textCol)

    def scrubPii(idCol: String, textCol: String,
                 denylist: Seq[String] = Seq("customer", "supplier")): DataFrame =
      TextOps.scrub(df, idCol, textCol, denylist)

    def fingerprint(idCol: String, textCol: String): DataFrame =
      TextOps.fingerprint(df, idCol, textCol)

    // ---- sampling / splitting ----
    def splitDeterministic(idCol: String): DataFrame =
      Sampling.deterministicSplit(df, idCol)

    def sampleStratified(stratumCol: String, idCol: String, n: Int): DataFrame =
      Sampling.stratifiedSample(df, stratumCol, idCol, n)

    def sampleProportional(stratumCol: String, idCol: String,
                           frac: Double): DataFrame =
      Sampling.proportionalSample(df, stratumCol, idCol, frac)

    /** Pack rows into ~`budget`-token shards per stratum (deterministic
      * (md5(id), id) packing order; `nTokens` is any token-count
      * expression over this frame's columns). */
    def shardByTokenBudget(stratumCol: String, idCol: String,
                           nTokens: Column, budget: Long): DataFrame =
      Sampling.tokenShardAssignments(df, stratumCol, idCol, nTokens, budget)

    /** First k rows per group under (col, ascending) order — the custom
      * bounded-memory top-k plan, not a Window. */
    def topKPerGroup(groupCols: Seq[String], orderBy: Seq[(String, Boolean)],
                     k: Int): DataFrame =
      graft.plans.TopKPerGroup.topKPerGroup(df, groupCols, orderBy, k)

    /** At most k rows per domain, chosen by deterministic hash rank —
      * skew-safe (TopKPerGroup under the hood, not a per-domain
      * window). */
    def capPerDomain(domainCol: String, idCol: String, k: Int): DataFrame =
      Sampling.domainCaps(df, domainCol, idCol, k)

    /** Corpus-wide C4-style span dedup report: per doc, how many of its
      * `width`-token chunks are the FIRST occurrence of that exact
      * span. */
    def dedupSpans(idCol: String, textCol: String,
                   width: Int = 32): DataFrame =
      TextOps.chunkDedup(df, idCol, textCol, width)

    /** Pack documents into fixed-`budget`-token training sequences in
      * `idCol` order (concat-and-chunk manifest: global offset, first
      * sequence, span count, position). */
    def packSequences(idCol: String, nTokens: Column,
                      budget: Long): DataFrame =
      Sampling.packManifest(df, idCol, nTokens, budget)

    /** Deterministic weighted sample of n rows, P(pick) ∝ weight
      * (Efraimidis–Spirakis keys from the id's md5 — reproducible
      * across retries, partitionings, and engines). */
    def sampleWeighted(idCol: String, weight: Column, n: Int): DataFrame =
      Sampling.weightedSample(df, idCol, weight, n)

    /** Deterministic per-epoch shuffle manifest: each epoch gets an
      * independent md5-salted permutation (pos within epoch + a
      * round-robin shard), reproducible with no stored permutation
      * table — re-deriving any shard of any epoch is stateless. */
    def shuffleEpochs(idCol: String, epochs: Int = Sampling.X19Epochs,
                      nShards: Int = Sampling.X19Shards): DataFrame =
      Sampling.epochShuffle(df, idCol, epochs, nShards)

    /** Bloom pre-filtered benchmark decontamination over (id, fp)
      * frames: the benchmark compresses to a [[Dedup.X18Bits]]-bit
      * filter (O(bits) broadcast at any benchmark size), the corpus
      * never shuffles, per-row verdicts carry bloom/exact/FP flags. */
    def decontaminateBloom(benchmark: DataFrame): DataFrame =
      Dedup.bloomDecontaminate(df, benchmark)

    /** DSIR-style importance weights: per doc, Σ c_f·ln(p_target/p_raw)
      * over hashed unigram features, micro-scaled int64. `targetPred`
      * marks the target-domain rows (e.g. `col("lang") === "en"`). */
    def importanceWeights(idCol: String, textCol: String,
                          targetPred: Column): DataFrame =
      Curation.importanceWeights(df, idCol, textCol, targetPred)

    /** Top-k TF-IDF terms per document (smoothed IDF, map-side-capped
      * per-doc ranking). */
    def tfidfTopTerms(idCol: String, textCol: String,
                      k: Int = 3): DataFrame =
      TextOps.tfidfTopTerms(df, idCol, textCol, k)

    /** P(next|context) top-k continuation table over the `nCtx` most
      * frequent context tokens — the bigram LM's serving artifact. */
    def lmContinuations(textCol: String, nCtx: Int = 20,
                        k: Int = 3): DataFrame =
      TextOps.lmContinuations(df, textCol, nCtx, k)

    /** Count-Min sketch estimates vs the exact recount for the corpus
      * top-k tokens (the linear mergeable sketch; est ≥ truth always). */
    def cmsTokenCounts(textCol: String, k: Int = 10): DataFrame =
      TextOps.cmsFrequencies(df, textCol, k)

    /** Stride-1 duplicated-span coverage per document — the
      * exact-substring dedup signal (fraction of tokens inside some
      * corpus-repeated w-token span). */
    def spanCoverage(idCol: String, textCol: String,
                     w: Int = TextOps.T26Width): DataFrame =
      TextOps.spanCoverage(df, idCol, textCol, w)

    /** Train a unigram-LM subword inventory (SentencePiece's other
      * algorithm next to BPE): weighted-substring seed vocab, then
      * fixed rounds of hard EM (Viterbi segmentation / add-1
      * re-score); returns the top-k pieces with their log-probs. */
    def trainUnigramLm(textCol: String,
                       seedMulti: Int = TextOps.T27SeedMulti,
                       rounds: Int = TextOps.T27Rounds,
                       k: Int = TextOps.T27K): DataFrame =
      TextOps.unigramTrain(df, textCol, seedMulti, rounds, k)

    /** SoftDeDup sampling weights: every duplicate copy survives at
      * weight 1/|exact-dup family|, so a family contributes one
      * document's probability mass (composes with [[sampleWeighted]]
      * instead of dropping copies). */
    def softDedupWeights(idCol: String, textCol: String): DataFrame =
      Sampling.softDedupWeights(df, idCol, textCol)

    /** Audit one foreign-key edge against a parent table: non-null
      * child-key count, orphan count, pass verdict — one slim-key
      * join, dimension parents broadcast. */
    def auditForeignKey(childCol: String, parent: DataFrame,
                        parentCol: String): DataFrame =
      Checks.fkOrphans(df, childCol, parent, parentCol,
        s"$childCol->$parentCol")

    /** Tokenize with a pre-trained unigram-LM model (the serve path
      * to [[trainUnigramLm]]'s fit; defaults to the pinned sf0.01
      * model): per-document word and subword-piece totals. */
    def encodeUnigramLm(idCol: String, textCol: String,
                        pieces: Seq[String] = TextOps.pinnedUnigramPieces,
                        scores: Seq[Double] = TextOps.pinnedUnigramScores,
                        unk: Double = TextOps.T29UnkScore): DataFrame =
      TextOps.unigramEncodeWith(df, idCol, textCol, pieces, scores, unk)

    /** Zipf rank-frequency profile of the corpus: least-squares
      * ln(freq) ~ ln(rank) fit over the top-k token ranks (slope ≈ −1
      * for natural language; drift is a data-quality signal), plus
      * vocabulary/token totals. One row out. */
    def zipfProfile(textCol: String, k: Int = TextOps.T28K): DataFrame =
      TextOps.zipfProfile(df, textCol, k)

    /** Probe this batch against an already-ingested corpus for
      * near-duplicates (banded minhash candidates, exact-Jaccard
      * verdicts; the store's text is sketched, never rescanned). */
    def dedupNearIncremental(store: DataFrame, idCol: String,
                             textCol: String,
                             threshold: Double = 0.7): DataFrame =
      Dedup.incrementalNearDup(df, store, idCol, textCol, threshold)

    /** C4-style blocklist filter: per doc, flagged-token count/fraction
      * over `terms` and the `flagged_frac < maxFrac` keep verdict (the
      * term list rides as a codegen'd literal — no join). */
    def filterBlocklist(idCol: String, textCol: String,
                        terms: Seq[String],
                        maxFrac: Double = 0.05): DataFrame =
      TextOps.blocklistFilter(df, idCol, textCol, terms, maxFrac)

    /** CCNet/RefinedWeb boilerplate scrub: spans occurring `minDf`+
      * times anywhere in the corpus lose ALL copies; returns per doc
      * the chunk counts and the reconstructed `clean_text`. */
    def scrubBoilerplate(idCol: String, textCol: String,
                         width: Int = 32, minDf: Long = 2L): DataFrame =
      TextOps.boilerplateScrub(df, idCol, textCol, width, minDf)

    /** Cluster-balanced diversity sample over an embedding frame
      * (`idCol`, `sv` = L2-normalized vector): nearest cell per vector
      * against `cents`, at most `nPerCell` rows per cell by
      * deterministic md5 rank. */
    def sampleClusterBalanced(idCol: String,
                              cents: Array[Array[Double]],
                              nPerCell: Int = 5): DataFrame =
      Sampling.clusterSample(df, idCol, cents, nPerCell)

    /** Score every document with a pinned linear quality model over
      * hashed bag-of-words features (fastText-style serving; weights
      * in micros ride as a plan literal — no join). */
    def classifyQuality(idCol: String, textCol: String,
                        weightsMicro: Array[Long] =
                          Curation.qualityModelMicro): DataFrame =
      Curation.qualityClassifier(df, idCol, textCol, weightsMicro)

    /** Scrub this batch against an already-ingested corpus's span
      * ledger (`TextOps.boilerplateStore` output — fp counts, never
      * text): spans whose combined store+batch count reaches `minDf`
      * lose all batch copies. */
    def scrubBoilerplateIncremental(store: DataFrame, idCol: String,
                                    textCol: String, width: Int = 32,
                                    minDf: Long = 2L): DataFrame =
      TextOps.incrementalBoilerplate(df, store, idCol, textCol, width, minDf)

    /** Margin-based bitext mining (Artetxe–Schwenk ratio margin) of
      * this embedding frame against `tgt` — both carry (vec_id, v,
      * nrm). Exact all-pairs; at scale feed LSH candidates instead
      * (see `Similarity.bitextMineLsh`). */
    def mineBitext(tgt: DataFrame, k: Int = 4): DataFrame =
      graft.operators.Similarity.bitextMine(df, tgt, k)

    // ---- joins ----
    /** Fuzzy benchmark decontamination: best whole-document Jaccard
      * match of each corpus doc against the (broadcast) benchmark at
      * the x16 threshold — catches rephrased eval items exact-shingle
      * containment underweights. */
    def decontaminateFuzzy(benchmark: DataFrame, idCol: String,
                           textCol: String,
                           threshold: Double = Dedup.X16Threshold): DataFrame =
      Dedup.fuzzyDecontaminate(
        Dedup.docShingles(df, idCol, textCol),
        Dedup.docShingles(benchmark, idCol, textCol), threshold)

    /** Backward as-of with a staleness bound (merge_asof tolerance):
      * matches older than `toleranceUs` microseconds yield nulls. */
    def asofJoinWithin(right: DataFrame, key: String, ts: String,
                       rightVals: Seq[String], toleranceUs: Long): DataFrame =
      TemporalJoins.asofJoinTolerance(df, right, key, ts, rightVals, toleranceUs)

    def asofJoin(right: DataFrame, key: String, ts: String,
                 rightVals: Seq[String]): DataFrame =
      TemporalJoins.asofJoin(df, right, key, ts, rightVals)

    def rangeJoinCount(right: DataFrame, key: String, ts: String,
                       leftId: String, widthMicros: Long): DataFrame =
      TemporalJoins.rangeJoinCount(df, right, key, ts, leftId, widthMicros)

    def saltedJoin(small: DataFrame, key: String, idCol: String,
                   salts: Int = 8): DataFrame =
      Skew.saltedJoin(df, small, key, idCol, salts)

    /** j06: point-in-time feature join — aggregate `right` rows with
      * the same `key` in `[leftTs − widthMicros, leftTs)` per left row
      * (strictly before: leakage-free feature backfill). */
    def rangeJoinAgg(right: DataFrame, key: String, ts: String,
                     leftId: String, valCol: String, widthMicros: Long,
                     aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
      TemporalJoins.rangeJoinAgg(df, right, key, ts, leftId, valCol,
        widthMicros, aggs)

    /** d13: edit-distance-≤1 pair mining via SymSpell delete-variant
      * blocking over `(id, name)` frames. */
    def fuzzyPairs(): DataFrame = Dedup.fuzzyPairs(df)

    /** d14: maximal cross-document duplicated token spans — the
      * removal list form of [[spanCoverage]]. */
    def dupSpans(idCol: String, textCol: String,
                 width: Int = TextOps.T26Width): DataFrame =
      TextOps.dupSpans(df, idCol, textCol, width)

    /** t30: interpolated Kneser–Ney bigram probabilities (top-k by
      * count). */
    def knBigrams(textCol: String, k: Int = 20): DataFrame =
      TextOps.knBigrams(df, textCol, k)

    /** x20: water-filling mixture realization — per-stratum
      * allocations hitting a `budgetFrac` total under availability
      * caps. */
    def mixtureWaterfill(stratumCol: String,
                         mass: org.apache.spark.sql.Column,
                         budgetFrac: Double = Sampling.X20BudgetFrac): DataFrame =
      Sampling.mixtureWaterfill(df, stratumCol, mass, budgetFrac)

    /** v04: PSI drift report over an already-binned population frame
      * (`bin: int` in [0, nBins), `is_ref: boolean`). */
    def psiReport(nBins: Int = Checks.V04NBins): DataFrame =
      Checks.psiReport(df, nBins)

    /** x21: leakage-safe split report — membership decided per content
      * family so no duplicate family straddles train/val/test. */
    def familySplit(idCol: String, textCol: String): DataFrame =
      Sampling.familySplit(df, idCol, textCol)

    /** d15: probe this batch of `(id, name)` rows against an
      * accumulated delete-variant store; matched rows report their
      * best fuzzy match, unmatched rows are the admissions. */
    def fuzzyAdmit(store: DataFrame): DataFrame =
      Dedup.incrementalFuzzy(df, store)

    /** x22: per-sequence fill/fragment report over an x10-shaped
      * packing manifest (this frame = the manifest). */
    def packEfficiency(budget: Long): DataFrame =
      Sampling.packEfficiency(df, budget)

    /** v05: per-source Jensen–Shannon divergence of unigram
      * distributions vs the whole-frame mix. */
    def vocabDivergence(srcCol: String, textCol: String): DataFrame =
      Checks.vocabDivergence(df, srcCol, textCol)

    /** t31: fraction of each of this frame's docs' token windows
      * appearing verbatim in `train` (memorization audit; this frame
      * is the EVAL side). */
    def memorizationAgainst(train: DataFrame, idCol: String,
                            textCol: String,
                            w: Int = TextOps.T26Width): DataFrame =
      TextOps.memorization(train, df, idCol, textCol, w)

    /** d16: realized LSH S-curve — per-Jaccard-bin recall of the
      * minhash band candidates vs exact ground truth on this corpus. */
    def lshScurve(idCol: String, textCol: String,
                  minJaccard: Double = Dedup.D16MinJaccard): DataFrame =
      Dedup.lshScurve(df, idCol, textCol, minJaccard)

    /** d17: probe this batch's simhash signatures against an
      * accumulated signature store (frames carry (doc_id, sig) —
      * see `Dedup.simhashStore`). */
    def simhashAdmit(store: DataFrame): DataFrame =
      Dedup.incrementalSimhash(df, store)

    /** v06: docs/tokens each dedup lens (exact / near / span) would
      * remove from this corpus — the release sign-off report. Needs
      * an `n_chars` column (the keep-best tiebreak). */
    def dedupImpact(idCol: String, textCol: String): DataFrame =
      Curation.dedupImpact(df, idCol, textCol)

    /** t32: BPE tokens per whitespace word per group under a merge
      * list (tokenizer fertility). */
    def bpeFertility(groupCol: String, textCol: String,
                     merges: Seq[(String, String)] = TextOps.pinnedMerges)
        : DataFrame =
      TextOps.bpeFertilityWith(df, groupCol, textCol, merges)
  }
}
