package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Declarative data-quality constraints, Deequ-style (Schelter et al.,
  * "Automating Large-Scale Data Quality Verification", VLDB 2018): a
  * pipeline declares the invariants its tables must satisfy and gets a
  * (check, metric, passed) report — the gate a curation/ingest job
  * runs before publishing a snapshot.
  *
  * Scale shape: EVERY declared check folds into ONE aggregate pass
  * over the table (all metrics are native map-side-combinable
  * aggregates — counts, count-distinct, min/max), and the report rows
  * are exploded from the single 1-row result. One scan, one tiny
  * shuffle, regardless of how many checks are declared. Metrics are
  * integer counts or exact min/max — no float accumulation, so the
  * report is engine-exact and oracle-checkable.
  */
object Checks {

  sealed trait Check {
    /** Stable report key, e.g. `not_null(o_custkey)`. */
    def id: String
    /** The aggregate expression producing this check's metric. */
    def metric: Column
    /** Pass/fail verdict over the computed metric. Must be NON-NULL for
      * every metric value the check can produce, including the
      * empty-table case — a gate filtering `passed = false` must not
      * silently skip a NULL verdict, and `getBoolean` must not NPE. */
    def verdict(m: Column): Column
  }

  /** Violations = rows where the column is null; pass iff 0.
    * Empty table: 0 violations (sum() is NULL over zero rows, so the
    * count is coalesced), vacuously passing. */
  final case class NotNull(c: String) extends Check {
    val id = s"not_null($c)"
    def metric: Column =
      coalesce(sum(col(c).isNull.cast("long")), lit(0L)).cast("double")
    def verdict(m: Column): Column = m === 0.0
  }

  /** Violations = rows − distinct values; pass iff 0 (key property).
    * count()/count_distinct() are 0 (never NULL) on an empty table, so
    * the empty case passes vacuously with metric 0. */
  final case class Unique(c: String) extends Check {
    val id = s"unique($c)"
    def metric: Column = (count(lit(1)) - count_distinct(col(c))).cast("double")
    def verdict(m: Column): Column = m === 0.0
  }

  /** Metric = observed min; pass iff min ≥ lo. Empty table: there is no
    * observed min — metric stays NULL (honest) but the verdict is a
    * definite vacuous `true`, never NULL. */
  final case class MinBound(c: String, lo: Double) extends Check {
    val id = s"min_bound($c)"
    def metric: Column = min(col(c)).cast("double")
    def verdict(m: Column): Column = coalesce(m >= lo, lit(true))
  }

  /** Metric = observed max; pass iff max ≤ hi. Empty-table semantics as
    * [[MinBound]]: NULL metric, vacuously-true non-null verdict. */
  final case class MaxBound(c: String, hi: Double) extends Check {
    val id = s"max_bound($c)"
    def metric: Column = max(col(c)).cast("double")
    def verdict(m: Column): Column = coalesce(m <= hi, lit(true))
  }

  /** Violations = rows whose value is outside the allowed set (nulls
    * count as violations); pass iff 0. Empty table: 0 violations. */
  final case class InSet(c: String, allowed: Seq[String]) extends Check {
    val id = s"in_set($c)"
    def metric: Column =
      coalesce(sum(when(col(c).isin(allowed.map(x => x: Any): _*), 0L)
        .otherwise(1L)), lit(0L)).cast("double")
    def verdict(m: Column): Column = m === 0.0
  }

  /** Run every check in ONE aggregate pass; report (chk, metric,
    * passed) sorted by check id. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val metricCols = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"m$i") }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    one.select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.id).as("chk"), col(s"m$i").as("metric"),
          c.verdict(col(s"m$i")).as("passed"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("chk")
  }

  /** v01: the orders-table contract — keys unique, FK non-null, price
    * positive, status in its domain — plus one deliberately-failing
    * bound (max ≤ 100k) so the report demonstrates both verdicts. */
  def ordersContract(s: SparkSession, dir: String): DataFrame =
    run(t(s, dir, "orders"), Seq(
      NotNull("o_custkey"),
      Unique("o_orderkey"),
      MinBound("o_totalprice", 0.0),
      MaxBound("o_totalprice", 100000.0),
      InSet("o_orderstatus", Seq("O", "F", "P"))))

  /** One declared foreign-key edge of a star schema. */
  final case class FkEdge(child: String, childCol: String,
                          parent: String, parentCol: String) {
    def id: String = s"$child.$childCol->$parent.$parentCol"
  }

  /** The testdata warehouse's FK edges — v02's audit set, and the
    * single source for its replay SQL. */
  val warehouseEdges: Seq[FkEdge] = Seq(
    FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem", "l_partkey", "part", "p_partkey"),
    FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("nation", "n_regionkey", "region", "r_regionkey"),
    FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"))

  /** One FK edge's audit row: non-null child-key count, orphan count
    * (child keys with no parent row), pass verdict. The join carries
    * ONLY the key column from either side — never the fact payload —
    * so a dimension parent broadcasts and a fact-fact edge shuffles
    * one slim column. */
  def fkOrphans(child: DataFrame, childCol: String,
                parent: DataFrame, parentCol: String,
                edge: String): DataFrame = {
    val ck = child.select(col(childCol).as("k")).where(col("k").isNotNull)
    val pk = parent.select(col(parentCol).as("k")).distinct()
      .withColumn("hit", lit(1))
    ck.join(pk, Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphans"))
      .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0L).as("ok"))
  }

  /** v02: referential-integrity audit over every declared warehouse
    * FK edge — the cross-table half of the Deequ-style gate (v01 is
    * the single-table half).
    *
    * r18 restructure (guide §1.2/§2.4): ONE scan per CHILD table
    * instead of one per edge — lineitem's three edges read its three
    * key columns in a single pass, each parent's distinct key set
    * broadcast-LEFT-joins in sequence (row multiplicity provably
    * unchanged: the parent side is distinct), and one aggregate
    * computes every edge's (n_child, n_orphans) pair, unpivoted to the
    * per-edge report rows (the v03 explode pattern). Per-edge
    * semantics are fkOrphans' exactly: n_child counts non-null child
    * keys, an orphan is a non-null key with no parent hit. The r17
    * plan ran 7 independent scan→join→agg branches (42 exchanges,
    * 47 AQE stage-jobs measured); still only key columns are ever
    * scanned — a fact table's payload never moves. */
  def referentialIntegrity(s: SparkSession, dir: String): DataFrame =
    warehouseEdges.groupBy(_.child).toSeq.sortBy(_._1).map {
      case (child, edges) =>
        var df = t(s, dir, child)
          .select(edges.map(e => col(e.childCol)).distinct: _*)
        edges.zipWithIndex.foreach { case (e, i) =>
          val pk = t(s, dir, e.parent)
            .select(col(e.parentCol).as(s"k_$i")).distinct()
            .withColumn(s"hit_$i", lit(1))
          df = df.join(broadcast(pk), col(e.childCol) === col(s"k_$i"), "left")
        }
        val aggs = edges.zipWithIndex.flatMap { case (e, i) => Seq(
          count(when(col(e.childCol).isNotNull, 1)).as(s"n_child_$i"),
          coalesce(sum(when(col(e.childCol).isNotNull && col(s"hit_$i").isNull,
            1L).otherwise(0L)), lit(0L)).as(s"n_orphans_$i")) }
        val entries = edges.zipWithIndex.map { case (e, i) =>
          struct(lit(e.id).as("edge"),
            col(s"n_child_$i").as("n_child"),
            col(s"n_orphans_$i").as("n_orphans"),
            (col(s"n_orphans_$i") === 0L).as("ok")) }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(entries: _*)).as("p"))
          .select("p.*")
    }.reduce(_ unionByName _).orderBy("edge")

  /** v03 profiled columns — single-sourced into the oracle replay. */
  val V03NumCols: Seq[String] = Seq("o_orderkey", "o_custkey", "o_totalprice")
  val V03StrCols: Seq[String] = Seq("o_orderstatus", "o_orderpriority")

  /** v03: one-pass column profile — the Deequ ANALYZER surface next
    * to v01's constraint gate and v02's cross-table audit: per column,
    * row count, null count, exact distinct count, and min/max
    * (numerics as r4 doubles, strings verbatim; each row carries one
    * family and NULLs the other, so the report schema is fixed no
    * matter which columns are profiled).
    *
    * Scale shape: ONE aggregate job computes every metric — the
    * multi-column `count_distinct` plans as Spark's Expand (one data
    * pass at ×(k+1) row width, the standard price of exact
    * multi-distinct; at 100 TB swap in `approx_count_distinct` if ±2%
    * is acceptable and the Expand disappears — q20's documented
    * trade). The single result row then explodes into the per-column
    * report, so nothing is collected and no second scan exists. */
  def profile(df: DataFrame, numCols: Seq[String],
              strCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      (numCols ++ strCols).flatMap { c => Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__ndist")) } ++
      numCols.flatMap { c => Seq(
        TextOps.r4(min(col(c)).cast("double")).as(s"${c}__min"),
        TextOps.r4(max(col(c)).cast("double")).as(s"${c}__max")) } ++
      strCols.flatMap { c => Seq(
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")) }
    val entries = numCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__min").as("min_num"), col(s"${c}__max").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ strCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  def ordersProfile(s: SparkSession, dir: String): DataFrame =
    profile(t(s, dir, "orders"), V03NumCols, V03StrCols)

  /** v04 binning constants — single-sourced into the oracle replay
    * (the V03NumCols discipline): 10 equal-width value bins and the
    * snapshot split date. */
  val V04NBins: Int = 10
  val V04BinWidth: Double = 50000.0
  val V04SplitDate: String = "1998-01-01"

  /** v04: distribution-drift audit — the Population Stability Index
    * between two snapshots of the same table (the monitoring gate a
    * production pipeline runs on every refresh: "has this column's
    * distribution moved since the reference snapshot?"). Reference
    * population = orders before [[V04SplitDate]], current = after;
    * `o_totalprice` is histogrammed into [[V04NBins]] equal-width
    * bins, counts are add-half smoothed (Laplace ½ per bin, so empty
    * bins never divide by zero and the index is defined for ANY pair
    * of snapshots), and each bin reports its PSI term
    * `(p−q)·ln(p/q)` — the standard credit-scoring drift measure;
    * Σ terms < 0.1 is the conventional "stable" verdict, which the
    * `stable` column applies per bin contribution.
    *
    * Scale shape: ONE narrow scan (two pushed-down column reads), one
    * 10-row aggregate per side — the bin frame is a literal VALUES
    * list both engines share, so missing bins still report. Counts
    * are exact integers; the only float math is the smoothed divide
    * and one `ln`, floored at 6 dp before comparison (the repo-wide
    * engine-portability discipline). */
  def driftPsi(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val split = lit(V04SplitDate).cast("timestamp")
    val bin = least(floor(col("o_totalprice") / V04BinWidth),
      lit(V04NBins - 1L)).cast("int").as("bin")
    psiReport(orders.select(bin,
      (col("o_orderdate") < split).as("is_ref")))
  }

  /** The PSI report over an already-binned population frame
    * (`bin: int` in [0, `nBins`), `is_ref: boolean`) — the form
    * the laws test directly (identical populations ⇒ every term 0).
    * `nBins` defaults to the v04 fixture's [[V04NBins]] but is a
    * parameter (r13, advisor): the bins frame is the LEFT side of the
    * join, so a caller whose binning uses more bins would otherwise
    * have those rows counted in the totals but silently dropped from
    * the report. */
  def psiReport(binned: DataFrame, nBins: Int = V04NBins): DataFrame = {
    val s = binned.sparkSession
    // ONE corpus pass: totals reduce the bin-count frame (nBins rows)
    // instead of re-aggregating `binned` — the corpus contributes its
    // bin key once, and AQE reuses the shared aggregate stage between
    // the two consumers (gated by PlanGateSpec s32). The explicit
    // isNotNull matches the filter Catalyst infers on the join-build
    // side; without it the two subtrees are canonically unequal and
    // the reuse never fires (bin is never null, so it's a no-op).
    val counts = binned.filter(col("bin").isNotNull).groupBy("bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val bins = s.range(nBins).select(col("id").cast("int").as("bin"))
    val totals = counts.agg(
      sum("n_ref").as("t_ref"),
      sum("n_cur").as("t_cur"))
    val half = lit(0.5)
    val p = (col("n_ref") + half) / (col("t_ref") + lit(0.5 * nBins))
    val q = (col("n_cur") + half) / (col("t_cur") + lit(0.5 * nBins))
    val r6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    bins.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        r6((p - q) * log(p / q)).as("psi_term"))
      .withColumn("stable", col("psi_term") < lit(0.01))
      .orderBy("bin")
  }

  /** v05: per-source vocabulary divergence — the TEXT-side companion
    * of v04's numeric PSI: Jensen–Shannon divergence between each
    * source's unigram distribution and the corpus-wide distribution,
    * the monitoring dial a mixture plan watches ("did source X's
    * vocabulary drift away from the mix?"). JSD is symmetric and
    * bounded by ln 2, so one threshold works for every source.
    *
    * Absent-word terms need no materialized (source, word) frame:
    * for w ∉ source, p = 0 and m = q/2, so the contribution is
    * q·ln 2 — summed in closed form as ln 2 · (1 − Σ_{w∈source} q_w).
    * The sums over PRESENT words run on the (source, word) count
    * frame only.
    *
    * Scale shape: ONE (source, word) count shuffle over the exploded
    * tokens (map-side combined); the global word frame is a grouped
    * reduction of that same frame (vocab-sized, far below corpus
    * size), joined back word-keyed; per-source totals broadcast. The
    * only float math is the divides and `ln`s, and the report value is
    * floored at 6 dp (the v04/x11 engine-portability discipline). */
  def vocabDivergence(s: SparkSession, dir: String): DataFrame =
    vocabDivergence(t(s, dir, "documents"), "source", "text")

  def vocabDivergence(docs: DataFrame, srcCol: String,
                      textCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
      explode(split(trim(col(textCol)), "\\s+")).as("w"))
    // the (source, word) count frame feeds FOUR consumers (itself, the
    // global/vocab reduce, the per-source totals, the grand total) —
    // localCheckpoint so the corpus explode+shuffle runs ONCE, and the
    // three reductions read the vocab-sized frame (blocks auto-released
    // on plan GC, the minhashLsh note)
    val st = tok.groupBy("source", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val global = st.groupBy("w").agg(sum("c").as("cg"))
    val totals = st.groupBy("source").agg(sum("c").as("ns"))
    val grand = st.agg(sum("c").as("n")) // 1 row
    val joined = st.join(global, "w")
      .join(totals, "source")
      .crossJoin(broadcast(grand))
    val p = col("c").cast("double") / col("ns").cast("double")
    val q = col("cg").cast("double") / col("n").cast("double")
    val m = (p + q) / 2.0
    // Each word's two KL terms are floored to NANO-units BEFORE the
    // per-source sum (the x11 lam_micro discipline): float addition is
    // order-dependent under Spark's partial aggregation, integer
    // addition is not — and the oracle replays the identical
    // floor-then-sum, so the equivalence is exact, not approximate.
    val nano = (c: Column) => floor(c * 1e9 + 0.5).cast("long")
    val perSrc = joined.groupBy("source")
      .agg(max(col("ns")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(nano(p * log(p / m))).as("kp_nano"),
        sum(nano(q * log(q / m))).as("kq_nano"),
        sum(col("cg")).as("cg_sum"),
        max(col("n")).as("n"))
    val r6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    val absentMass =
      lit(1.0) - col("cg_sum").cast("double") / col("n").cast("double")
    perSrc.select(col("source"), col("n_tokens"), col("vocab"),
        r6((col("kp_nano").cast("double") / 1e9) * 0.5
          + (col("kq_nano").cast("double") / 1e9
             + absentMass * math.log(2.0)) * 0.5).as("jsd"))
      .orderBy("source")
  }

  /** v08: split-leakage audit — the audit that PROVES x21's
    * leakage-safety claim with numbers instead of asserting it: (a)
    * content-level — how many d01 content fingerprints appear in
    * more than one split (0 by construction of the family split; the
    * audit guards the MATERIALIZED assignment against a future
    * per-doc-hash regression), and (b) n-gram-level — for val and
    * test, what share of their distinct word trigrams also occurs in
    * train (expected nonzero; the number a contamination-aware eval
    * (t31/x05) needs before trusting held-out perplexity).
    *
    * Scale shape: one narrow assignment pass (id, fp, split — the
    * x21 frame), one trigram explode (the t33 cost class) cut to
    * DISTINCT (split, fp) slim rows and localCheckpoint'd (three
    * consumers: train set, val probe, test probe); each probe is an
    * fp-keyed LEFT join + 1-row aggregate. Report is 7 (metric,
    * value) rows, all-integer/milli. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(t(s, dir, "documents"), "doc_id", "text")

  def splitLeakage(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    splitLeakageFrom(
      Sampling.familySplitAssignments(docs, idCol, textCol), docs,
      idCol, textCol)

  /** [[splitLeakage]] over a pre-built (id, fp, split) family-split
    * assignment — lets v10 derive it from its shared fingerprint pass
    * instead of re-scanning the corpus (r18). */
  private[graft] def splitLeakageFrom(assignIn: DataFrame, docs: DataFrame,
                                      idCol: String,
                                      textCol: String): DataFrame = {
    // assignment frame feeds two consumers (the multi-split audit and
    // the trigram probe join) — checkpoint so its fingerprint pass
    // runs once; lazy (r18) so both checkpoints materialize inside the
    // report's own job instead of as separate driver-synced jobs
    val assign = assignIn.localCheckpoint(eager = false)
    val multi = assign.select("fp", "split").distinct()
      .groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("value"))
      .select(lit("content_fps_multi_split").as("metric"), col("value"))
    val sfp = TextOps.trigramFps(docs, idCol, textCol)
      .join(assign.select(col(idCol), col("split")), Seq(idCol))
      .select("split", "fp").distinct()
      .localCheckpoint(eager = false)
    val train = sfp.filter(col("split") === "train")
      .select("fp").withColumn("hit", lit(1L))
    def probe(which: String): DataFrame =
      sfp.filter(col("split") === which).select("fp")
        .join(train, Seq("fp"), "left")
        .agg(count(lit(1)).as("n"),
          coalesce(sum(coalesce(col("hit"), lit(0L))), lit(0L)).as("h"))
        .selectExpr(s"""stack(3,
          '${which}_ngrams', n,
          '${which}_ngrams_in_train', h,
          '${which}_leak_milli',
            CASE WHEN n = 0L THEN 0L
                 ELSE CAST(floor(h * 1000.0 / n + 0.5) AS BIGINT)
            END) AS (metric, value)""")
    multi.unionByName(probe("val")).unionByName(probe("test"))
      .orderBy("metric")
  }

  /** v10: contamination-governance datasheet — the five contamination
    * lenses the engine ships (x05 exact shingle overlap, x16 fuzzy
    * Jaccard overlap, x18 Bloom pre-filter + exact membership, t31
    * window memorization, v08 split leakage) composed into ONE
    * release-gate report (the v06 pattern applied to contamination):
    * per lens, how many documents it flags, how many it probed, and
    * the milli rate — the page a data-release review reads instead of
    * five separate artifacts. Each lens answers a different question
    * (is the eval doc in the corpus / nearly in it / possibly in it /
    * how much of it is memorized / do the splits leak); a gate needs
    * all five with consistent denominators.
    *
    * Rows (ordered by lens): `bloom_exact` / `bloom_prefilter` over
    * the whole corpus (x18's scenario — the benchmark was scraped
    * from the same web), `exact_overlap` / `fuzzy_overlap` over
    * shingled train docs (x05/x16's corpus side), `memorization`
    * over eval docs with >= T26Width tokens (t31's probe set),
    * `split_content` / `split_ngrams` from v08's audit.
    * `rate_milli = floor(flagged*1000/probed + 0.5)` uniformly
    * (0 when probed = 0) — all-integer, hash-stable.
    *
    * Scale shape: every lens is already corpus-linear with a
    * broadcast benchmark side (their own scaladocs carry the 100 TB
    * argument; no train×eval product anywhere — gated); this report
    * adds only 1-row aggregates on top, shares the shingled-split
    * frame between x05 and x16 via localCheckpoint (one shingle
    * kernel pass, two consumers), and the v08 member result (7 rows)
    * is checkpointed for its two readers. Empty stages still report
    * their 0 row (the q35/v06 law). */
  def contaminationReport(s: SparkSession, dir: String): DataFrame =
    contaminationReport(t(s, dir, "documents"), "doc_id", "text")

  def contaminationReport(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // ONE per-doc kernel pass computes BOTH the hashed-shingle set
    // (x05/x16's input) and the content fingerprint (x18's + the
    // split_content denominator's) — r18, guide §1.2: the r17 form ran
    // two separate corpus passes (each re-paying the scan + fan-out
    // exchange) for per-doc columns derivable side by side. Lazy
    // checkpoint: all consumers live inside the one final report
    // query, so the blocks materialize inside its first stage instead
    // of as their own driver-synced jobs.
    val base = Sampling.deterministicSplit(
      docs.select(col(idCol).as("doc_id"),
        graft.functions.Hashing.hashedShingles(col(textCol)).as("sh"),
        Sampling.contentFp(col(textCol)).as("fp")), "doc_id")
      .localCheckpoint(eager = false)
    // docShingles' contract: docs with no shingles drop out
    val sh = base.filter(size(col("sh")) >= 1).select("doc_id", "sh", "split")
    val shTrain = sh.filter(col("split") === "train")
    val shTest = sh.filter(col("split") === "test")
    val x05 = Dedup.decontaminate(shTrain, shTest)
    val x16 = Dedup.fuzzyDecontaminate(shTrain, shTest, Dedup.X16Threshold)
    // x18 probes the WHOLE corpus against the test-split benchmark
    // (its registered composition, Dedup.scala)
    val fps = base.select("doc_id", "fp", "split")
    val x18 = Dedup.bloomDecontaminate(
      fps.select("doc_id", "fp"),
      fps.filter(col("split") === "test").select("doc_id", "fp"))
    val sp = Sampling.deterministicSplit(docs, idCol)
    val t31 = TextOps.memorization(sp.filter(col("split") === "train"),
      sp.filter(col("split") === "test"), idCol, textCol)
    // v08's family-split assignment keys on the SAME contentFp the
    // base pass already computed — derive it instead of re-scanning
    val v08 = splitLeakageFrom(
      Sampling.deterministicSplit(
        base.select(col("doc_id").as(idCol), col("fp")), "fp"),
      docs, idCol, textCol).localCheckpoint(eager = false)

    def cnt(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).cast("long").as(name))
    def two(lens: String, flagged: DataFrame, probed: DataFrame): DataFrame =
      flagged.crossJoin(probed) // two 1-row frames (the gated BNLJ case)
        .select(lit(lens).as("lens"), col("docs_flagged"), col("docs_probed"))
    val trainProbed = cnt(shTrain, "docs_probed")
    val exact = two("exact_overlap",
      cnt(x05, "docs_flagged"), trainProbed)
    val fuzzy = two("fuzzy_overlap",
      cnt(x16, "docs_flagged"), trainProbed)
    // both bloom rows from ONE aggregate pass over the x18 frame
    val bloom = x18.agg(
        coalesce(sum(when(col("exact_hit"), 1L).otherwise(0L)), lit(0L))
          .as("n_exact"),
        coalesce(sum(when(col("bloom_hit"), 1L).otherwise(0L)), lit(0L))
          .as("n_bloom"),
        count(lit(1)).cast("long").as("n"))
      .selectExpr("""stack(2,
        'bloom_exact', n_exact, n,
        'bloom_prefilter', n_bloom, n) AS (lens, docs_flagged, docs_probed)""")
    val memo = t31.agg(
        coalesce(sum(when(col("n_memorized") > 0L, 1L).otherwise(0L)),
          lit(0L)).as("docs_flagged"),
        count(lit(1)).cast("long").as("docs_probed"))
      .select(lit("memorization").as("lens"),
        col("docs_flagged"), col("docs_probed"))
    // one aggregate over the 7-row v08 report extracts all three
    // member values; distinct-content denominator is its own 1-row agg
    val v08vals = v08.agg(
      max(when(col("metric") === "content_fps_multi_split", col("value")))
        .as("n_multi"),
      max(when(col("metric") === "test_ngrams_in_train", col("value")))
        .as("n_leak"),
      max(when(col("metric") === "test_ngrams", col("value"))).as("n_test"))
    // denominator from the SAME checkpointed fp column — the r17 form
    // re-scanned the corpus and re-ran the fingerprint kernel for one
    // countDistinct
    val nFps = fps.agg(countDistinct(col("fp")).as("n_fps"))
    val splitRows = v08vals.crossJoin(nFps)
      .selectExpr("""stack(2,
        'split_content', n_multi, n_fps,
        'split_ngrams', n_leak, n_test) AS (lens, docs_flagged, docs_probed)""")
    exact.unionByName(fuzzy).unionByName(bloom).unionByName(memo)
      .unionByName(splitRows)
      .select(col("lens"),
        coalesce(col("docs_flagged"), lit(0L)).as("docs_flagged"),
        coalesce(col("docs_probed"), lit(0L)).as("docs_probed"))
      .withColumn("rate_milli",
        when(col("docs_probed") === 0L, 0L)
          .otherwise(floor(col("docs_flagged") * 1000.0
            / col("docs_probed") + 0.5).cast("long")))
      .orderBy("lens")
  }

  /** v07: corpus datasheet — the one-page release artifact
    * ("Datasheets for Datasets", Gebru et al., CACM 2021) a 100 TB
    * corpus ships with: volume (docs/tokens/chars), composition
    * (languages/sources), duplication (d01's content-fingerprint
    * rule), and token-length spread, as (stat, value) rows.
    *
    * Scale shape: ONE corpus pass over a narrow per-doc projection
    * (token count, fp, lang, source — computed in the scan
    * projection; text never shuffles). The three exact
    * count-distincts plan as ONE aggregate via Catalyst's expand
    * (3× the NARROW rows, map-side combined — the price of exact
    * distincts in a single pass; a release artifact can't ship
    * approx_count_distinct). The report is unpivoted from the 1-row
    * aggregate — all integers/milli, engine-exact. */
  def corpusDatasheet(s: SparkSession, dir: String): DataFrame =
    corpusDatasheet(t(s, dir, "documents"))

  def corpusDatasheet(docs: DataFrame): DataFrame = {
    val d = docs.select(
      size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"),
      col("n_chars").cast("bigint").as("n_chars"),
      col("lang"), col("source"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
    val a = d.agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      sum("n_chars").as("n_chars"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      countDistinct("fp").as("n_distinct_content"),
      min("n_tokens").as("tokens_min"),
      max("n_tokens").as("tokens_max"))
    a.select(
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_langs"),
        col("n_sources"), col("n_distinct_content"), col("tokens_min"),
        col("tokens_max"),
        (col("n_docs") - col("n_distinct_content")).as("dup_docs"),
        floor((col("n_docs") - col("n_distinct_content")) * 1000.0
          / col("n_docs") + 0.5).cast("long").as("dup_milli"),
        floor(col("n_tokens") * 1000.0 / col("n_docs") + 0.5).cast("long")
          .as("tokens_avg_milli"))
      .selectExpr("""stack(11,
        'n_docs', n_docs, 'n_tokens', n_tokens, 'n_chars', n_chars,
        'n_langs', n_langs, 'n_sources', n_sources,
        'n_distinct_content', n_distinct_content,
        'tokens_min', tokens_min, 'tokens_max', tokens_max,
        'dup_docs', dup_docs, 'dup_milli', dup_milli,
        'tokens_avg_milli', tokens_avg_milli) AS (stat, value)""")
      .orderBy("stat")
  }
}
