package graft

import graft.operators.{Pca, Pinned, Sampling, Similarity, TextOps}

/** Spark-dialect SQL text for the registry tail that
  * `SparkEntry.sparkSql`'s hand-written entries don't cover: the
  * kernel-bound dedup/LSH/ANN family and the iterative BPE pair.
  * Together with the 23 dialect-portable oracles and the 50 inline
  * Spark forms, this closes the delegated-SQL surface at 97/97: every
  * registered query is addressable as `spark.sql(...)` text on a
  * session with [[GraftExtensions]] applied (the kernels —
  * `graft_shingles`, `graft_minhash_bands`, `graft_simhash`,
  * `graft_dot`, `graft_lsh_bucket`, `graft_nibble_hist`,
  * `graft_bpe_apply` — are FunctionRegistry entries wrapping the SAME
  * JVM kernels the DataFrame operators call, so SQL/DataFrame parity
  * is structural).
  *
  * Texts that embed model state (IVF centroids, PQ codebooks, OPQ
  * rotation, PCA mean/components, k-means cells, the s03c anchor set)
  * are GENERATED from the [[Pinned]] fixtures with plain
  * left-associative unrolled sums — the same sequential order as the
  * engine's codegen'd dots, the discipline the DuckDB oracles
  * established.
  *
  * Connected components: Spark 4.1 supports `WITH RECURSIVE` but only
  * with UNION ALL, which diverges on the cyclic reach closure the
  * DuckDB oracles use — so the CC tail here is [[ccTail]]: K unrolled
  * single-reference min-label-propagation rounds with an in-query
  * `assert_true` convergence guard in the capGuard
  * error-not-silence discipline. */
object SparkDialectTail {

  // ---------------------------------------------------------------
  // shared fragments
  // ---------------------------------------------------------------

  /** Hashed-shingle docs via the registered kernel (n=3) — the same
    * frame `Dedup.docShingles` builds. */
  private val docsCte: String =
    """docs AS (
         SELECT doc_id, sh FROM (
           SELECT doc_id, graft_shingles(text, 3) AS sh FROM documents)
         WHERE size(sh) >= 1)"""

  private val jaccardExpr: String =
    """round(CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) /
         CAST(size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh)) AS DOUBLE), 4)"""

  /** Exact all-pairs shingle-Jaccard pair CTE at `threshold` —
    * the d03 semantics (DedupSpec pins d02 ≡ d03 at the spec SFs). */
  private def jaccardPairsCte(threshold: Double): String =
    s"""pairs AS (
         SELECT a.doc_id AS pa, b.doc_id AS pb
         FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         WHERE $jaccardExpr >= $threshold)"""

  /** Embeddings with the engine's double cast and norm. */
  private val embCte: String =
    """en AS (
         SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM (
           SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings))"""

  /** K unrolled min-label-propagation (hook) rounds over a
    * `pairs(pa, pb)` CTE, ending in `clusters(id, cluster)`. The edge
    * list carries SELF-LOOPS so each round is ONE join + group-by —
    * `m_r(n) = min over {m_{r-1} of n and its neighbors}` — and, key
    * constraint, each round references the previous round's CTE
    * exactly ONCE: Spark INLINES CTEs, so any round shape that reads
    * its predecessor twice (e.g. hook+jump pointer doubling) blows the
    * inlined plan up 4^K-fold and the analyzer never returns. Hook
    * rounds converge in diameter(D) rounds; a final round must change
    * NOTHING — `assert_true` raises a self-describing error otherwise
    * (hook-stability ⇒ labels locally constant ⇒ per-component min,
    * the same labels the engine's large-star/small-star loop
    * converges to). This linear-depth unroll is a PARITY artifact for
    * the SQL-text surface — the engine path stays the O(log n)
    * star-contraction in Dedup.connectedComponents. */
  private def ccTail(k: Int, sfx: String = "",
                     pairsCte: String = "pairs"): String = {
    val rounds = (1 to k).map { r =>
      s"""c$sfx$r AS (
           SELECT e.a AS n, min(y.m) AS m
           FROM edges$sfx e JOIN c$sfx${r - 1} y ON e.b = y.n
           GROUP BY e.a)"""
    }.mkString(",\n         ")
    s"""edges$sfx AS (
           SELECT t.e.a AS a, t.e.b AS b FROM $pairsCte
           LATERAL VIEW explode(array(
             struct(pa AS a, pb AS b), struct(pb AS a, pa AS b),
             struct(pa AS a, pa AS b), struct(pb AS a, pb AS b))) t AS e),
         c${sfx}0 AS (SELECT a AS n, a AS m
           FROM (SELECT DISTINCT a FROM edges$sfx)),
         $rounds,
         ccguard$sfx AS (
           SELECT assert_true(count(1) = 0,
             'graft cc: min-label propagation not converged after $k rounds - raise K') AS ok
           FROM (SELECT e.a AS n, min(y.m) AS m2
                 FROM edges$sfx e JOIN c$sfx$k y ON e.b = y.n
                 GROUP BY e.a) nx
           JOIN c$sfx$k cur ON nx.n = cur.n
           WHERE nx.m2 <> cur.m),
         clusters$sfx AS (
           SELECT n AS id, m AS cluster FROM c$sfx$k CROSS JOIN ccguard$sfx)"""
  }

  /** keep-best tail over `clusters(id, cluster)` + documents. */
  private val keepBestSql: String =
    """SELECT cluster, doc_id AS kept_doc_id, n_chars AS kept_chars, n_members
       FROM (
         SELECT c.cluster, d.doc_id, d.n_chars,
           row_number() OVER (PARTITION BY c.cluster
             ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk,
           count(1) OVER (PARTITION BY c.cluster) AS n_members
         FROM clusters c JOIN documents d ON c.id = d.doc_id)
       WHERE rk = 1 ORDER BY cluster"""

  /** The minhash-LSH candidate pair CTE (threshold-filtered, with
    * jaccard) — the d02 engine path through the registered kernels. */
  private val minhashPairsCte: String =
    """banded AS (
         SELECT doc_id, band, key FROM (
           SELECT doc_id, graft_minhash_bands(sh) AS bands FROM docs)
         LATERAL VIEW posexplode(bands) t AS band, key),
       cand AS (
         SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM banded x JOIN banded y
           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       j AS (
         SELECT c.doc_a, c.doc_b, a.sh AS sh_a, b.sh AS sh_b
         FROM cand c JOIN docs a ON a.doc_id = c.doc_a
                     JOIN docs b ON b.doc_id = c.doc_b),
       withjac AS (
         SELECT doc_a, doc_b,
           round(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) /
             CAST(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)) AS DOUBLE), 4) AS jaccard
         FROM j)"""

  /** Multi-table integer-grid LSH buckets via the registered kernel:
    * table tb uses plane offset tb·nPlanes — the engine's disjoint
    * plane families (plane sets are compiled into the kernel call, so
    * each table is its own literal-arg invocation). */
  private def bucketsCte(nTables: Int, nPlanes: Int): String = {
    val calls = (0 until nTables)
      .map(tb => s"graft_lsh_bucket(v, $nPlanes, ${tb * nPlanes})")
      .mkString(",\n             ")
    s"""buckets AS (
         SELECT vec_id, tb, bucket FROM en
         LATERAL VIEW posexplode(array(
             $calls)) t AS tb, bucket)"""
  }

  /** In-query cap guard (Spark twin of the oracle capGuardCte): the
    * uncapped SQL replay is valid only while every bucket/cell is at
    * or below the engine cap — single-sourced from the same constant. */
  private def capGuard(name: String, sizeSql: String): String = {
    val cap = Similarity.DefaultBucketCap
    s"""guard AS (
         SELECT assert_true(max(cnt) <= $cap,
           '$name: a bucket/cell exceeds the engine cap ($cap); the engine output is anchor-capped there and this uncapped SQL replay no longer applies') AS ok
         FROM ($sizeSql))"""
  }

  private def elem(arr: String, i: Int): String = s"element_at($arr, $i)"

  /** Σ sv[d]·c[d] unrolled left-associative — the codegen'd dot's
    * sequential order (the same discipline as the DuckDB oracles). */
  private def dotLit(vc: String, c: Array[Double]): String =
    c.indices.map(d => s"${elem(vc, d + 1)}*(${c(d)})").mkString(" + ")

  /** Per-centroid dot array over normalized vector `vc`. */
  private def centroidDotsArr(vc: String, cents: Array[Array[Double]]): String =
    cents.map(c => s"(${dotLit(vc, c)})").mkString("array(", ",\n             ", ")")

  /** Normalized-embedding CTE `n(vec_id, sv)` (engine float path:
    * sv = v / sqrt(dot(v, v)) with the codegen'd dot). */
  private val normCte: String =
    """n AS (
         SELECT vec_id, transform(v, x -> x / nrm) AS sv
         FROM (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM (
           SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)))"""

  /** Unrolled q·a dot over two normalized 64-dim vectors. */
  private def pairDot(qc: String, ac: String): String =
    (1 to 64).map(d => s"${elem(qc, d)}*${elem(ac, d)}").mkString(" + ")

  /** Shared ANN output tail: rank per query, top-3. */
  private val rankTail: String =
    """SELECT q_id, rk, n_id, cos FROM (
         SELECT q_id, n_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         FROM scored)
       WHERE rk <= 3 ORDER BY q_id, rk"""

  // ---------------------------------------------------------------
  // PQ-family generators (Spark twins of the oracle builders)
  // ---------------------------------------------------------------

  /** Per-subspace encode score arrays s0..s{m-1}:
    * 2⟨x_j, B_jc⟩ − ‖B_jc‖², ‖·‖² baked sequentially. */
  private def pqScoreCols(books: Array[Array[Array[Double]]], sub: Int,
                          e: Int => String): String = {
    def scores(j: Int): String = books(j).map { c =>
      val n2 = c.map(x => x * x).sum
      val d = c.indices.map(i => s"${e(j * sub + i + 1)}*(${c(i)})").mkString(" + ")
      s"2.0*($d) - ($n2)"
    }.mkString("array(", ",\n             ", ")")
    books.indices.map(j => s"${scores(j)} AS s$j").mkString(",\n           ")
  }

  /** codes[j] = first-max argmax of s_j (array_position is 1-based
    * first match, same tie rule as the engine). */
  private def pqCodesArr(m: Int): String =
    (0 until m).map(j => s"array_position(s$j, array_max(s$j)) - 1")
      .mkString("array(", ", ", ")")

  /** Query-side ADC LUT: lut[j][c] = ⟨q_sub_j, B_jc⟩,
    * centroid-first product order. */
  private def pqLutArr(books: Array[Array[Array[Double]]], sub: Int,
                       vc: String): String = {
    def lutJ(j: Int): String = books(j).map { c =>
      s"(${c.indices.map(i => s"(${c(i)})*${elem(vc, j * sub + i + 1)}").mkString(" + ")})"
    }.mkString("array(", ",\n             ", ")")
    books.indices.map(lutJ).mkString("array(", ",\n           ", ")")
  }

  /** ADC sum folded in subspace order. */
  private def pqApprox(m: Int): String =
    (1 to m).map(j =>
      s"element_at(element_at(q.lut, $j), CAST(element_at(c.codes, $j) AS INT) + 1)")
      .mkString(" + ")

  /** Top-`rerank` ADC candidates per query, exact re-rank over `vc`
    * of CTE `n`, top-3. */
  private def pqRerankTail(rerank: Int, vc: String): String =
    s"""cand AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, n_id ASC) AS crk
           FROM adcscored) WHERE crk <= $rerank),
         scored AS (
           SELECT cand.q_id, cand.n_id,
             round(${pairDot(s"qn.$vc", s"an.$vc")}, 6) AS cos
           FROM cand
           JOIN n an ON an.vec_id = cand.n_id
           JOIN n qn ON qn.vec_id = cand.q_id)
         $rankTail"""

  // ---------------------------------------------------------------
  // the forms
  // ---------------------------------------------------------------

  private lazy val d02Sql: String =
    s"""WITH $docsCte,
         $minhashPairsCte
         SELECT doc_a, doc_b, jaccard FROM withjac
         WHERE jaccard >= 0.7 ORDER BY doc_a, doc_b"""

  private lazy val d03Sql: String =
    s"""WITH $docsCte
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           $jaccardExpr AS jaccard
         FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         WHERE $jaccardExpr >= 0.7
         ORDER BY doc_a, doc_b"""

  /** d12: the cross-split exact-Jaccard replay over the shared hashed
    * shingle CTE; split constant single-sourced from
    * [[graft.operators.Dedup.D12SplitAt]]. */
  private lazy val d12Sql: String =
    s"""WITH $docsCte,
         m AS (
           SELECT b.doc_id AS doc_id, a.doc_id AS store_id,
             $jaccardExpr AS jaccard
           FROM docs a JOIN docs b
             ON a.doc_id < ${graft.operators.Dedup.D12SplitAt}
             AND b.doc_id >= ${graft.operators.Dedup.D12SplitAt}
           WHERE $jaccardExpr >= 0.7)
         SELECT doc_id, store_id AS best_match, jaccard, n_matches FROM (
           SELECT doc_id, store_id, jaccard,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY jaccard DESC, store_id ASC) AS rk,
             count(*) OVER (PARTITION BY doc_id) AS n_matches
           FROM m)
         WHERE rk = 1 ORDER BY doc_id"""

  private lazy val d04Sql: String =
    s"""WITH $docsCte,
         sigs AS (SELECT doc_id, graft_simhash(sh) AS sig FROM docs),
         banded AS (
           SELECT doc_id, chunk, key FROM sigs
           LATERAL VIEW posexplode(array(
             shiftrightunsigned(sig, 0) & CAST(65535 AS BIGINT),
             shiftrightunsigned(sig, 16) & CAST(65535 AS BIGINT),
             shiftrightunsigned(sig, 32) & CAST(65535 AS BIGINT),
             shiftrightunsigned(sig, 48) & CAST(65535 AS BIGINT))) t AS chunk, key),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM banded x JOIN banded y
             ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT c.doc_a, c.doc_b, bit_count(sa.sig ^ sb.sig) AS hamming
         FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
                     JOIN sigs sb ON sb.doc_id = c.doc_b
         WHERE bit_count(sa.sig ^ sb.sig) <= 3
         ORDER BY doc_a, doc_b"""

  private lazy val d05Sql: String =
    s"""WITH $docsCte,
         ${jaccardPairsCte(0.7)},
         ${ccTail(8)}
         SELECT id AS doc_id, cluster FROM clusters ORDER BY doc_id"""

  private lazy val d06Sql: String =
    s"""WITH $docsCte,
         ex AS (SELECT doc_id, shingle FROM docs
                LATERAL VIEW explode(sh) t AS shingle),
         rare AS (SELECT shingle FROM (
             SELECT shingle, count(1) AS df FROM ex GROUP BY shingle)
           WHERE df <= 50),
         kept AS (SELECT ex.doc_id, ex.shingle FROM ex
                  JOIN rare ON ex.shingle = rare.shingle),
         sized AS (SELECT doc_id, count(1) AS n FROM kept GROUP BY doc_id),
         ek AS (SELECT k.doc_id, k.shingle, s.n FROM kept k
                JOIN sized s ON k.doc_id = s.doc_id),
         inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, count(1) AS inter
           FROM ek a JOIN ek b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n)
         SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 4) AS jaccard
         FROM inter
         WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 4) >= 0.7
         ORDER BY doc_a, doc_b"""

  private lazy val d07Sql: String =
    s"""WITH $embCte,
         pairs AS (
           SELECT a.vec_id AS pa, b.vec_id AS pb
           FROM en a JOIN en b ON a.vec_id < b.vec_id
           WHERE round(graft_dot(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4),
         ${ccTail(8)}
         SELECT id AS vec_id, cluster FROM clusters ORDER BY vec_id"""

  private lazy val d08Sql: String =
    s"""WITH $docsCte,
         ${jaccardPairsCte(0.7)},
         ${ccTail(8)}
         $keepBestSql"""

  private lazy val d09Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 12, nPlanes = 8)},
         ${capGuard("d09", "SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket")},
         pairs AS (
           SELECT DISTINCT a.vec_id AS pa, b.vec_id AS pb
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           JOIN en ea ON ea.vec_id = a.vec_id
           JOIN en eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard
           WHERE round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) >= 0.4),
         ${ccTail(8)}
         SELECT id AS vec_id, cluster FROM clusters ORDER BY vec_id"""

  private lazy val d10Sql: String =
    s"""WITH $docsCte,
         $minhashPairsCte,
         pairs AS (SELECT doc_a AS pa, doc_b AS pb FROM withjac
                   WHERE jaccard >= 0.7),
         ${ccTail(8)}
         $keepBestSql"""

  private lazy val m03Sql: String =
    """WITH med AS (
         SELECT element_at(array('image','audio','video'),
                  CAST(doc_id % 3 AS INT) + 1) AS kind,
           CAST(text AS BINARY) AS payload
         FROM documents),
       f AS (
         SELECT kind, length(payload) AS n_bytes,
           CAST(element_at(graft_nibble_hist(payload), 5) /
                CAST(greatest(length(payload), 1) AS DOUBLE) AS FLOAT) AS f4
         FROM med)
       SELECT kind, count(1) AS n, round(avg(f4), 4) AS avg_f4,
         round(CAST(sum(n_bytes) AS DOUBLE), 4) AS total_bytes
       FROM f GROUP BY kind ORDER BY kind"""

  private val q20Sql: String =
    """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_partkey) AS n_part,
         CAST(abs(approx_count_distinct(l_suppkey) - count(DISTINCT l_suppkey)) AS DOUBLE)
           <= 0.15 * count(DISTINCT l_suppkey) AS supp_ok,
         CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) AS DOUBLE)
           <= 0.15 * count(DISTINCT l_partkey) AS part_ok,
         count(1) AS n_rows
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  private val q32Sql: String =
    """SELECT l_returnflag,
         round(percentile(l_quantity, 0.5), 4) AS median_qty,
         round(percentile(l_extendedprice, 0.9), 4) AS p90_price,
         approx_percentile(l_quantity, 0.5, 10000)
           BETWEEN percentile(l_quantity, 0.48) AND percentile(l_quantity, 0.52) AS median_ok,
         approx_percentile(l_extendedprice, 0.9, 10000)
           BETWEEN percentile(l_extendedprice, 0.88) AND percentile(l_extendedprice, 0.92) AS p90_ok,
         count(1) AS n_rows
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  private lazy val s03Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 6)},
         ${capGuard("s03", "SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket")}
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) AS cos
         FROM buckets a JOIN buckets b
           ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         JOIN en ea ON ea.vec_id = a.vec_id
         JOIN en eb ON eb.vec_id = b.vec_id
         CROSS JOIN guard
         WHERE round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) >= 0.3
         ORDER BY id_a, id_b"""

  /** s03c: unlike the DuckDB oracle (which needs the PINNED anchor
    * fixture because xxhash64 isn't DuckDB-replayable), Spark SQL has
    * the very same `xxhash64`, so this form replays the engine's
    * ACTUAL anchor selection (`Similarity.anchorFlagged`: the bucket
    * min, plus xxhash64(vec_id) mod ⌈rn/cap⌉ = 0) at ANY SF — no
    * fixture. Guard INVERTED vs capGuard: errors if the capped regime
    * is NOT engaged (max bucket ≤ 8). */
  private lazy val s03cSql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 4)},
         guard AS (
           SELECT assert_true(max(cnt) > 8,
             's03c: every bucket is at or below the cap (8) - the anchor-star capped regime is not engaged and this query no longer verifies it') AS ok
           FROM (SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket)),
         sizes AS (
           SELECT bucket, count(1) AS rn, min(vec_id) AS min_id
           FROM buckets GROUP BY bucket),
         anchors AS (
           SELECT b.vec_id, b.bucket FROM buckets b JOIN sizes s
             ON b.bucket = s.bucket
           WHERE b.vec_id = s.min_id
              OR pmod(xxhash64(b.vec_id),
                   CAST(ceil(CAST(s.rn AS DOUBLE) / 8) AS BIGINT)) = 0),
         pairs AS (
           SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
             greatest(a.vec_id, b.vec_id) AS id_b,
             round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) AS cos
           FROM anchors a JOIN buckets b
             ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
           JOIN en ea ON ea.vec_id = a.vec_id
           JOIN en eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard)
         SELECT id_a, id_b, cos FROM pairs
         WHERE cos >= 0.3 ORDER BY id_a, id_b"""

  private lazy val s04Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 4)},
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(graft_dot(qe.v, ae.v) / (qe.nrm * ae.nrm), 6) AS cos
           FROM buckets q JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
           JOIN en qe ON qe.vec_id = q.vec_id
           JOIN en ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         $rankTail"""

  /** s37 Spark-dialect replay — the bucket CTE tagged with the
    * engine's segment/tombstone residues, one grouped count. */
  private lazy val s37Sql: String = {
    val S = graft.operators.Similarity
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 4)},
         seg AS (
           SELECT bucket,
             vec_id % ${S.S37InsertMod} = ${S.S37InsertResidue} AS is_insert,
             vec_id % ${S.S28TombMod} = ${S.S28TombResidue} AS is_dead
           FROM buckets)
         SELECT bucket,
           CAST(sum(CASE WHEN NOT is_insert THEN 1 ELSE 0 END) AS BIGINT)
             AS n_base,
           CAST(sum(CASE WHEN is_insert THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserts,
           CAST(sum(CASE WHEN is_dead THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dead,
           CAST(sum(CASE WHEN NOT is_dead THEN 1 ELSE 0 END) AS BIGINT)
             AS n_live
         FROM seg GROUP BY bucket ORDER BY bucket"""
  }

  /** s33 Spark-dialect replay — s04's form with the label equality
    * folded into the candidate join. */
  private lazy val s33Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 4)},
         lab AS (SELECT vec_id, label FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, ql.label, a.vec_id AS n_id,
             round(graft_dot(qe.v, ae.v) / (qe.nrm * ae.nrm), 6) AS cos
           FROM buckets q
           JOIN lab ql ON ql.vec_id = q.vec_id
           JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
           JOIN lab al ON al.vec_id = a.vec_id AND al.label = ql.label
           JOIN en qe ON qe.vec_id = q.vec_id
           JOIN en ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, label, rk, n_id, cos FROM (
           SELECT q_id, label, n_id, cos,
             row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** s28 Spark-dialect replay — s04's form with the tombstone
    * predicate on the candidate side. */
  private lazy val s28Sql: String = {
    val m = Similarity.S28TombMod
    val r = Similarity.S28TombResidue
    s"""WITH $embCte,
         ${bucketsCte(nTables = 1, nPlanes = 4)},
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(graft_dot(qe.v, ae.v) / (qe.nrm * ae.nrm), 6) AS cos
           FROM buckets q JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
             AND a.vec_id % $m <> $r
           JOIN en qe ON qe.vec_id = q.vec_id
           JOIN en ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         $rankTail"""
  }

  /** s27 Spark-dialect replay — per-truncation brute force via
    * `slice` + `graft_dot`, joined to the full-dim truth set. */
  private lazy val s27Sql: String = {
    val dims = Similarity.S27Dims
    def topCte(name: String, slice: String => String): String =
      s"""$name AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(graft_dot(${slice("q.v")}, ${slice("a.v")})
                   / (sqrt(graft_dot(${slice("q.v")}, ${slice("q.v")}))
                      * sqrt(graft_dot(${slice("a.v")}, ${slice("a.v")}))),
                   6) DESC, a.vec_id ASC) AS rk
             FROM e q JOIN e a ON a.vec_id <> q.vec_id
             WHERE q.vec_id < 5)
           WHERE rk <= 3)"""
    val ctes = (topCte("fullr", identity) +: dims.map(d =>
      topCte(s"t$d", v => s"slice($v, 1, $d)"))).mkString(",\n         ")
    val arms = dims.map { d =>
      s"""SELECT $d AS trunc_dim, f.q_id,
           count(t.n_id) AS hits,
           floor(CAST(count(t.n_id) AS DOUBLE) / 3 * 1e4 + 0.5)/1e4 AS recall
         FROM fullr f LEFT JOIN t$d t ON t.q_id = f.q_id AND t.n_id = f.n_id
         GROUP BY f.q_id"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
           FROM embeddings),
         $ctes
         SELECT * FROM (
         $arms)
         ORDER BY trunc_dim, q_id"""
  }

  private lazy val s05Sql: String = {
    val dts = centroidDotsArr("sv", Pinned.ivfCentroids)
    s"""WITH $normCte,
         asg AS (SELECT vec_id, sv,
             array_position(dts, array_max(dts)) - 1 AS c
           FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(${pairDot("q.sv", "a.sv")}, 6) AS cos
           FROM asg a JOIN asg q ON a.c = q.c AND a.vec_id <> q.vec_id
           WHERE q.vec_id < 5)
         $rankTail"""
  }

  /** s38 Spark-dialect replay — the s05 centroid machinery swept over
    * probe widths (cell ranks: dot DESC, cell ASC; arms as crank
    * filters; exhaustive truth). */
  private lazy val s38Sql: String = {
    val cents = Pinned.ivfCentroids
    val dts = centroidDotsArr("sv", cents)
    val probes = Similarity.S38Probes
    val nCent = cents.length
    val nPossible = 5 * 3
    val arms = probes.map { p =>
      s"""SELECT $p AS nprobe, CAST(count(1) AS BIGINT) AS n_hits
           FROM (
             SELECT q_id, n_id FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id ASC) AS rk
               FROM sc WHERE crank <= $p)
             WHERE rk <= 3) got
           JOIN truth t ON got.q_id = t.q_id AND got.n_id = t.n_id"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH $normCte,
         asg AS (SELECT vec_id, sv,
             CAST(array_position(dts, array_max(dts)) - 1 AS INT) AS c
           FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         qd AS (SELECT vec_id AS q_id, sv, dts
                FROM (SELECT vec_id, sv, $dts AS dts FROM n)
                WHERE vec_id < 5),
         qcells AS (
           SELECT q_id, cell,
             row_number() OVER (PARTITION BY q_id
               ORDER BY d DESC, cell ASC) AS crank
           FROM (SELECT q_id, i.cell AS cell,
                   element_at(dts, i.cell + 1) AS d
                 FROM qd,
                   (SELECT explode(sequence(0, ${nCent - 1})) AS cell) i)),
         sc AS (
           SELECT qc.q_id, a.vec_id AS n_id, qc.crank,
             round(${pairDot("q.sv", "a.sv")}, 6) AS cos
           FROM asg a
           JOIN qcells qc ON a.c = qc.cell
           JOIN qd q ON q.q_id = qc.q_id
           WHERE a.vec_id <> qc.q_id),
         truth AS (
           SELECT q_id, n_id FROM (
             SELECT q.q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(${pairDot("q.sv", "a.sv")}, 6) DESC,
                          a.vec_id ASC) AS rk
             FROM n a JOIN qd q ON a.vec_id <> q.q_id)
           WHERE rk <= 3)
         SELECT nprobe, n_hits, CAST($nPossible AS BIGINT) AS n_possible,
           CAST(floor(CAST(n_hits AS DOUBLE) * 1000.0 / ${nPossible}.0 + 0.5)
             AS BIGINT) AS recall_milli
         FROM (
           $arms)
         ORDER BY nprobe"""
  }

  /** s32 Spark-dialect replay — the s05 assignment arithmetic feeding
    * v04's PSI tail at nBins = the quantizer's cell count. */
  private lazy val s32Sql: String = {
    val cents = Pinned.ivfCentroids
    val dts = centroidDotsArr("sv", cents)
    val n = cents.length
    val frac = Similarity.S32SplitFrac
    val binVals = (0 until n).map(i => s"($i)").mkString(", ")
    val half = n / 2.0
    s"""WITH $normCte,
         cutv AS (SELECT CAST(floor(max(vec_id) * $frac) AS BIGINT) AS c
                  FROM embeddings),
         b AS (SELECT CAST(array_position(dts, array_max(dts)) - 1 AS INT)
                 AS bin,
                 CASE WHEN vec_id < cutv.c THEN 1 ELSE 0 END AS is_ref
               FROM (SELECT vec_id, sv, $dts AS dts FROM n), cutv
         ), c AS (
           SELECT bin, sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
           FROM b GROUP BY bin
         ), t AS (
           SELECT sum(is_ref) AS t_ref, sum(1 - is_ref) AS t_cur FROM b
         ), bins AS (SELECT * FROM VALUES $binVals AS v(bin)
         ), f AS (
           SELECT bins.bin,
             coalesce(c.n_ref, 0L) AS n_ref, coalesce(c.n_cur, 0L) AS n_cur,
             (coalesce(c.n_ref, 0L) + 0.5) / (t.t_ref + $half) AS p,
             (coalesce(c.n_cur, 0L) + 0.5) / (t.t_cur + $half) AS q
           FROM bins LEFT JOIN c ON bins.bin = c.bin CROSS JOIN t)
         SELECT bin, n_ref, n_cur,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 AS psi_term,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 < 0.01 AS stable
         FROM f ORDER BY bin"""
  }

  /** s34 Spark-dialect replay — the s05 pinned-cell assignment on both
    * splits (s32's floor(max·frac) cut), batch LEFT-joined onto its
    * rk=1 in-cell blocking match at the s34 threshold. */
  private lazy val s34Sql: String = {
    val dts = centroidDotsArr("sv", Pinned.ivfCentroids)
    val frac = Similarity.S34SplitFrac
    val thr = Similarity.S34Threshold
    s"""WITH $normCte,
         cutv AS (SELECT CAST(floor(max(vec_id) * $frac) AS BIGINT) AS c
                  FROM embeddings),
         asg AS (SELECT vec_id, sv,
                 CAST(array_position(dts, array_max(dts)) - 1 AS INT) AS cell
               FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         b AS (SELECT a.* FROM asg a, cutv WHERE a.vec_id >= cutv.c),
         st AS (SELECT a.* FROM asg a, cutv WHERE a.vec_id < cutv.c),
         matched AS (
           SELECT * FROM (
             SELECT b.vec_id AS vec_id, st.vec_id AS store_id,
               round(${pairDot("b.sv", "st.sv")}, 6) AS cos
             FROM b JOIN st ON b.cell = st.cell)
           WHERE cos >= $thr),
         best AS (
           SELECT vec_id, store_id, cos, n_near FROM (
             SELECT vec_id, store_id, cos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, store_id ASC) AS rk,
               count(*) OVER (PARTITION BY vec_id) AS n_near
             FROM matched) WHERE rk = 1)
       SELECT b.vec_id,
         best.vec_id IS NULL AS admit,
         coalesce(best.store_id, -1L) AS best_match,
         coalesce(best.cos, -1.0D) AS cos,
         coalesce(best.n_near, 0L) AS n_near
       FROM b LEFT JOIN best ON b.vec_id = best.vec_id
       ORDER BY b.vec_id"""
  }

  private lazy val s09Sql: String = {
    val books = Pinned.pq.books
    val sub = Pinned.pq.sub
    s"""WITH $normCte,
         enc AS (SELECT vec_id,
           ${pqScoreCols(books, sub, i => elem("sv", i))}
           FROM n),
         codes AS (SELECT vec_id, ${pqCodesArr(books.length)} AS codes FROM enc),
         q AS (SELECT vec_id AS q_id,
           ${pqLutArr(books, sub, "sv")} AS lut
           FROM n WHERE vec_id < 5),
         adcscored AS (
           SELECT q.q_id, c.vec_id AS n_id, ${pqApprox(books.length)} AS approx
           FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 100, vc = "sv")}"""
  }

  /** s39 Spark-dialect replay — s09's normalize+encode chain cut
    * before the query tail: per subspace ‖x_j‖² − array_max(s_j),
    * micro-floored per vector, m UNION arms, one m-row aggregate. */
  private lazy val s39Sql: String = {
    val books = Pinned.pq.books
    val sub = Pinned.pq.sub
    val distArms = books.indices.map { j =>
      val n2 = (1 to sub)
        .map(d => s"${elem("sv", j * sub + d)}*${elem("sv", j * sub + d)}")
        .mkString(" + ")
      s"""SELECT $j AS subspace,
           CAST(floor((($n2) - array_max(s$j)) * 1e6 + 0.5) AS BIGINT) AS d
           FROM enc"""
    }.mkString("\n           UNION ALL ")
    s"""WITH $normCte,
         enc AS (SELECT vec_id, sv,
           ${pqScoreCols(books, sub, i => elem("sv", i))}
           FROM n),
         d AS ($distArms)
         SELECT subspace, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(d) AS BIGINT) AS sum_dist_micro,
           CAST(max(d) AS BIGINT) AS max_dist_micro
         FROM d GROUP BY subspace ORDER BY subspace"""
  }

  private lazy val s10Sql: String = {
    val mdl = Pinned.ivfPq
    val cents = mdl.coarse.get
    val books = mdl.books
    val sub = mdl.sub
    val centsLit = cents.map(c => s"array(${c.mkString(", ")})")
      .mkString("array(", ",\n             ", ")")
    val dts = centroidDotsArr("sv", cents)
    s"""WITH $normCte,
         cl AS (SELECT $centsLit AS cl),
         asg AS (SELECT vec_id, sv,
             array_position(dts, array_max(dts)) - 1 AS c
           FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         enc AS (SELECT a.vec_id, a.c,
           ${pqScoreCols(books, sub,
             i => s"(element_at(a.sv, $i) - element_at(element_at(cl.cl, CAST(a.c AS INT) + 1), $i))")}
           FROM asg a CROSS JOIN cl),
         codes AS (SELECT vec_id, c, ${pqCodesArr(books.length)} AS codes FROM enc),
         qd AS (SELECT vec_id AS q_id, $dts AS qdts,
           ${pqLutArr(books, sub, "sv")} AS lut
           FROM n WHERE vec_id < 5),
         probes AS (SELECT q_id, c, q_dot_cent, lut FROM (
           SELECT q_id, lut, c, q_dot_cent,
             row_number() OVER (PARTITION BY q_id
               ORDER BY q_dot_cent DESC, c ASC) AS prk
           FROM (SELECT q_id, lut, pos AS c, q_dot_cent FROM qd
                 LATERAL VIEW posexplode(qdts) t AS pos, q_dot_cent))
           WHERE prk <= 3),
         adcscored AS (
           SELECT q.q_id, c.vec_id AS n_id,
             q.q_dot_cent + (${pqApprox(books.length)}) AS approx
           FROM codes c JOIN probes q ON c.c = q.c AND c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 50, vc = "sv")}"""
  }

  private lazy val s12Sql: String = {
    val m = Pca.pinnedModel
    def pcExpr(w: Array[Double]): String =
      (0 until 64).map(d => s"(${elem("v", d + 1)} - (${m.mean(d)}))*(${w(d)})")
        .mkString(" + ")
    val cols = m.components.zipWithIndex.map { case (w, i) =>
      s"round(${pcExpr(w)}, 4) AS pc${i + 1}"
    }.mkString(",\n           ")
    s"""WITH e AS (SELECT vec_id, label,
             transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
         SELECT vec_id, label,
           $cols
         FROM e ORDER BY vec_id"""
  }

  private lazy val s13Sql: String = {
    val rot = Pinned.opqRotation
    val books = Pinned.opqBooks.books
    val sub = Pinned.opqBooks.sub
    val m = books.length
    // The rotation as ONE permuted matrix literal + a fold-based
    // matrix-vector product, NOT 64 unrolled 64-term sums: the unroll
    // is a ~4096-term expression tree that blows codegen/broadcast
    // memory once CTE inlining duplicates it. The fold (zip_with +
    // aggregate from 0.0) adds terms in the same sequential order as
    // the engine's codegen'd dot, so values stay bit-identical.
    // Row p (1-based) is rot(d), d = ((p−1) mod m)·sub + (p−1) div m —
    // the engine's round-robin subspace dealing (rotatedFrame).
    val rotPerm = (1 to 64).map { p =>
      val d = ((p - 1) % m) * sub + (p - 1) / m
      s"array(${rot(d).mkString(", ")})"
    }.mkString("array(", ",\n             ", ")")
    s"""WITH ${normCte.replaceFirst("n AS", "n0 AS")},
         rl AS (SELECT $rotPerm AS rm),
         n AS (SELECT vec_id,
             transform(sequence(1, 64), p ->
               aggregate(zip_with(sv, element_at(rm, p), (x, y) -> x * y),
                 CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)) AS rv
           FROM n0 CROSS JOIN rl),
         enc AS (SELECT vec_id,
           ${pqScoreCols(books, sub, i => elem("rv", i))}
           FROM n),
         codes AS (SELECT vec_id, ${pqCodesArr(m)} AS codes FROM enc),
         q AS (SELECT vec_id AS q_id,
           ${pqLutArr(books, sub, "rv")} AS lut
           FROM n WHERE vec_id < 5),
         adcscored AS (
           SELECT q.q_id, c.vec_id AS n_id, ${pqApprox(m)} AS approx
           FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 100, vc = "rv")}"""
  }

  private lazy val s14Sql: String = {
    val dts = centroidDotsArr("sv", Pinned.semCells)
    // pair cosine via the COMPACT graft_dot over raw vectors (the
    // engine's own dot/(nrm·nrm) formula), NOT an unrolled 128-term
    // normalized dot: the CC chain inlines the pairs CTE ~10×, and an
    // unrolled dot there multiplies into an expression tree that OOMs
    // the analyzer.
    s"""WITH $embCte,
         $normCte,
         dd AS (SELECT vec_id, $dts AS dts FROM n),
         probes AS (SELECT vec_id, c FROM (
           SELECT vec_id, pos AS c, d,
             row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, pos ASC) AS prk
           FROM dd LATERAL VIEW posexplode(dts) t AS pos, d)
           WHERE prk <= 2),
         ${capGuard("s14", "SELECT count(1) AS cnt FROM probes GROUP BY c")},
         pairs AS (
           SELECT DISTINCT a.vec_id AS pa, b.vec_id AS pb
           FROM probes a JOIN probes b
             ON a.c = b.c AND a.vec_id < b.vec_id
           JOIN en ea ON ea.vec_id = a.vec_id
           JOIN en eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard
           WHERE round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) >= 0.4),
         ${ccTail(8)}
         SELECT id AS vec_id, cluster FROM clusters ORDER BY vec_id"""
  }

  /** BPE merge arrays from the pinned fixture, as SQL array literals. */
  private def mergeArrays(merges: Seq[(String, String)]): (String, String) = (
    merges.map(m => s"'${m._1}'").mkString("array(", ", ", ")"),
    merges.map(m => s"'${m._2}'").mkString("array(", ", ", ")"))

  private lazy val t14Sql: String = {
    val (lefts, rights) = mergeArrays(TextOps.pinnedMerges)
    s"""WITH words AS (
           SELECT doc_id, word FROM documents
           LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS word),
         vocab AS (SELECT DISTINCT word FROM words),
         encoded AS (
           SELECT word,
             CAST(size(graft_bpe_apply(word, $lefts, $rights)) AS BIGINT) AS n_sub
           FROM vocab)
         SELECT w.doc_id,
           count(1) AS n_words,
           sum(e.n_sub) AS n_bpe_tokens
         FROM words w JOIN encoded e ON w.word = e.word
         GROUP BY w.doc_id ORDER BY doc_id"""
  }

  /** t13: the 8-round training loop unrolled. Round r counts weighted
    * adjacent pairs over the vocabulary as encoded by merges 1..r−1 —
    * the re-encode goes through the registered engine kernel
    * (`graft_bpe_apply` from the RAW word with the merge list so far,
    * built by cross-joining the previous rounds' 1-row argmax CTEs) —
    * takes the (n DESC, a, b) argmax as merge r, and feeds forward. */
  private lazy val t13Sql: String = {
    def pairCnt(r: Int): String =
      s"""cnt$r AS (
           SELECT a, b, sum(freq) AS n FROM (
             SELECT freq, element_at(sy, i + 1) AS a, element_at(sy, i + 2) AS b
             FROM (SELECT freq, sy FROM enc${r - 1} WHERE size(sy) >= 2)
             LATERAL VIEW explode(sequence(0, size(sy) - 2)) t AS i)
           GROUP BY a, b),
         m$r AS (SELECT a, b, n FROM cnt$r ORDER BY n DESC, a ASC, b ASC LIMIT 1)"""
    def reEnc(r: Int): String = {
      val joins = (1 to r).map(i => s"CROSS JOIN m$i").mkString(" ")
      val lefts = (1 to r).map(i => s"m$i.a").mkString("array(", ", ", ")")
      val rights = (1 to r).map(i => s"m$i.b").mkString("array(", ", ", ")")
      s"""enc$r AS (
           SELECT v.word, v.freq, graft_bpe_apply(v.word, $lefts, $rights) AS sy
           FROM vocab v $joins)"""
    }
    val rounds = (1 to 8).map { r =>
      if (r < 8) s"${pairCnt(r)},\n         ${reEnc(r)}" else pairCnt(r)
    }.mkString(",\n         ")
    val out = (1 to 8).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS rank, a AS `left`, b AS `right`,
              concat(a, b) AS merged, n FROM m$r""")
      .mkString("\n         UNION ALL ")
    s"""WITH words AS (
           SELECT word FROM documents
           LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS word),
         vocab AS (SELECT word, count(1) AS freq FROM words GROUP BY word),
         enc0 AS (SELECT word, freq,
           concat(filter(split(word, ''), x -> x <> ''), array('</w>')) AS sy
           FROM vocab),
         $rounds
         SELECT * FROM ($out) ORDER BY rank"""
  }

  /** s17: the LSH-built graph ANN — candidate edges from the SAME
    * `graft_lsh_bucket` multi-table buckets as s03's form (6 tables ×
    * 6 planes), then the shared beam tail
    * ([[OracleSqlHelpers.graphBeamTail]], the single unroller both dialects
    * and both graph sources go through). */
  private lazy val s17Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuard("s17", "SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard),
         cs AS (
           SELECT id_a, id_b, ${OracleSqlHelpers.sparkCos("ea", "eb")} AS cos
           FROM cp JOIN en ea ON ea.vec_id = cp.id_a
           JOIN en eb ON eb.vec_id = cp.id_b),
         sc AS (
           SELECT id_a AS src, id_b AS dst, cos FROM cs
           UNION ALL SELECT id_b, id_a, cos FROM cs),
         ${OracleSqlHelpers.graphBeamTail(OracleSqlHelpers.sparkCos, "en",
           "vec_id AS q_id, v, nrm")}"""

  /** s19: the refined-graph form — s17's bucket candidates as `cs0`,
    * the unrolled NN-descent rounds (OracleSqlHelpers.nnDescentCtes, the
    * same generator as the DuckDB replay), then the shared beam
    * tail. */
  private lazy val s19Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuard("s19", "SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard),
         cs0 AS (
           SELECT id_a, id_b, ${OracleSqlHelpers.sparkCos("ea", "eb")} AS cos
           FROM cp JOIN en ea ON ea.vec_id = cp.id_a
           JOIN en eb ON eb.vec_id = cp.id_b),
         ${OracleSqlHelpers.nnDescentCtes(OracleSqlHelpers.sparkCos, "en",
           operators.Similarity.S19Rounds)},
         sc AS (
           SELECT id_a AS src, id_b AS dst, cos
           FROM cs${operators.Similarity.S19Rounds}
           UNION ALL SELECT id_b, id_a, cos
           FROM cs${operators.Similarity.S19Rounds}),
         ${OracleSqlHelpers.graphBeamTail(OracleSqlHelpers.sparkCos, "en",
           "vec_id AS q_id, v, nrm")}"""

  /** s18: the incremental-insert form — s17's bucket CTEs restricted
    * to the ingested corpus, the batch as queries, k = m. Split/entry/k
    * literals derive from the Similarity.S18* / GraphM constants, same
    * single-sourcing as the DuckDB replay. */
  /** The s18 candidate chain, Spark dialect — shared by s18/s20 the
    * same way OracleSqlHelpers.s18DuckChain serves the DuckDB replays (no
    * MATERIALIZED keyword here; Catalyst handles CTE reuse). */
  private def s18SparkChain(guardName: String): String = {
    val split = operators.Similarity.S18SplitId
    s"""$embCte,
         ${bucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuard(guardName,
           s"SELECT count(1) AS cnt FROM buckets WHERE vec_id >= $split GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard
           WHERE a.vec_id >= $split AND b.vec_id >= $split),
         cs AS (
           SELECT id_a, id_b, ${OracleSqlHelpers.sparkCos("ea", "eb")} AS cos
           FROM cp JOIN en ea ON ea.vec_id = cp.id_a
           JOIN en eb ON eb.vec_id = cp.id_b),
         sc AS (
           SELECT id_a AS src, id_b AS dst, cos FROM cs
           UNION ALL SELECT id_b, id_a, cos FROM cs)"""
  }

  private lazy val s18Sql: String = {
    val split = operators.Similarity.S18SplitId
    val entries = (split until split + operators.Similarity.S18NEntries)
      .mkString(", ")
    s"""WITH ${s18SparkChain("s18")},
         ${OracleSqlHelpers.graphBeamTail(OracleSqlHelpers.sparkCos, "en",
           "vec_id AS q_id, v, nrm", k = operators.Similarity.GraphM,
           qPred = s"vec_id < $split", entriesIn = entries)}"""
  }

  /** s20: the reciprocal-update form — the s18 chain, insert edges as
    * the `res` CTE, then each affected node's re-ranked top-m over
    * (degree-capped old edges ∪ incoming new edges). */
  private lazy val s20Sql: String = {
    val split = operators.Similarity.S18SplitId
    val entries = (split until split + operators.Similarity.S18NEntries)
      .mkString(", ")
    val m = operators.Similarity.GraphM
    s"""WITH ${s18SparkChain("s20")},
         ${OracleSqlHelpers.graphBeamTail(OracleSqlHelpers.sparkCos, "en",
           "vec_id AS q_id, v, nrm", k = m,
           qPred = s"vec_id < $split", entriesIn = entries,
           finalCteHeader = "res AS")},
         inc AS (
           SELECT n_id AS src, q_id AS dst, cos FROM res),
         oldg AS (
           SELECT src, dst, cos FROM (
             SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
             FROM sc) WHERE rk <= $m),
         uni AS (
           SELECT * FROM oldg UNION ALL SELECT * FROM inc),
         aff AS (SELECT DISTINCT src FROM inc)
         SELECT n_id, rk, dst, cos FROM (
           SELECT u.src AS n_id, u.dst AS dst, u.cos AS cos,
             row_number() OVER (PARTITION BY u.src ORDER BY u.cos DESC, u.dst ASC) AS rk
           FROM uni u JOIN aff a ON a.src = u.src) WHERE rk <= $m
         ORDER BY n_id, rk"""
  }

  /** s26 Spark-dialect replay — the same statement shape as the
    * DuckDB oracle (sign-bit halves as exact power-of-two sums, lo/hi
    * xor+bit_count Hamming, shortlist by (hamming, id), s01-form
    * cosine re-rank), with nCand from [[Similarity.S26NCand]]. */
  private lazy val s26Sql: String = {
    val nc = Similarity.S26NCand
    s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), n AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e
         ), sg AS (
           SELECT vec_id,
             aggregate(transform(sequence(0, 31),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS lo,
             aggregate(transform(sequence(32, 63),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i - 32 AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS hi
           FROM e
         ), ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(a.lo ^ q.lo) + bit_count(a.hi ^ q.hi) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5
         ), cand AS (
           SELECT q_id, n_id, hamming FROM (
             SELECT q_id, n_id, hamming,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY hamming ASC, n_id ASC) AS crk
             FROM ham)
           WHERE crk <= $nc
         ), rr AS (
           SELECT c.q_id, c.n_id, c.hamming,
             round(graft_dot(qe.v, ae.v) / (qe.nrm * ae.nrm), 6) AS cos
           FROM cand c
           JOIN n qe ON qe.vec_id = c.q_id
           JOIN n ae ON ae.vec_id = c.n_id)
         SELECT q_id, rk, n_id, hamming, cos FROM (
           SELECT q_id, n_id, hamming, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id ASC) AS rk
           FROM rr)
         WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  /** t25 Spark-dialect replay — the cell-count-table formulation of
    * the SAME sketch: CMS is linear, so per-(row, cell) instance
    * counts equal the aggregator's finished buffer cell-for-cell; the
    * kernels (`graft_fnv64`, `graft_cms_cells`) wrap the identical
    * JVM arithmetic the engine's UDAF folds with. */
  private lazy val t25Sql: String =
    """WITH words AS (
           SELECT explode(split(trim(text), '\\s+')) AS w FROM documents
         ), th AS (
           SELECT w, graft_fnv64(w) AS h FROM words
         ), counts AS (
           SELECT w, h, count(*) AS n FROM th GROUP BY w, h
         ), cells AS (
           SELECT w, n, posexplode(graft_cms_cells(h)) AS (r, cell) FROM counts
         ), cellcounts AS (
           SELECT r, cell, CAST(sum(n) AS BIGINT) AS cn
           FROM cells GROUP BY r, cell
         ), topk AS (
           SELECT w, n, rk FROM (
             SELECT w, n, row_number() OVER (ORDER BY n DESC, w ASC) AS rk
             FROM counts) WHERE rk <= 10
         )
         SELECT rk, w, n_exact, n_cms FROM (
           SELECT t.rk, t.w, t.n AS n_exact, min(cc.cn) AS n_cms
           FROM topk t
           JOIN cells c ON c.w = t.w
           JOIN cellcounts cc ON cc.r = c.r AND cc.cell = c.cell
           GROUP BY t.rk, t.w, t.n)
         ORDER BY rk"""

  /** t26 Spark-dialect replay — same statement shape as the DuckDB
    * oracle; fingerprints via the registered `graft_window_hashes`
    * kernel (the SAME JVM loop the engine folds with). Width from
    * [[TextOps.T26Width]]. */
  private lazy val t26Sql: String = {
    val w = TextOps.T26Width
    s"""WITH base AS (
           SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_tokens, text
           FROM documents
         ), wins AS (
           SELECT doc_id, posexplode(graft_window_hashes(text, $w)) AS (i, fp)
           FROM base WHERE n_tokens >= $w
         ), dup AS (
           SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2
         ), marked AS (
           SELECT wi.doc_id, wi.i, wi.i + ${w - 1} AS e
           FROM wins wi JOIN dup USING (fp)
         ), isl AS (
           SELECT doc_id,
             greatest(0, e - greatest(i - 1,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)))
               AS contrib
           FROM marked
         ), agg AS (
           SELECT doc_id, count(*) AS n_dup_windows,
             sum(contrib) AS covered_tokens
           FROM isl GROUP BY doc_id
         )
         SELECT b.doc_id, n_tokens,
           greatest(n_tokens - ${w - 1}, 0) AS n_windows,
           coalesce(a.n_dup_windows, 0L) AS n_dup_windows,
           coalesce(a.covered_tokens, 0L) AS covered_tokens,
           floor((CAST(coalesce(a.covered_tokens, 0L) AS DOUBLE)
                  / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4 AS dup_frac
         FROM base b LEFT JOIN agg a USING (doc_id)
         ORDER BY b.doc_id"""
  }

  /** d14 Spark-dialect replay — the t26 fingerprint CTEs with the
    * maximal-span tail (gap ⇒ new island; touching windows merge). */
  private lazy val d14Sql: String = {
    val w = TextOps.T26Width
    s"""WITH base AS (
           SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_tokens, text
           FROM documents
         ), wins AS (
           SELECT doc_id, posexplode(graft_window_hashes(text, $w)) AS (i, fp)
           FROM base WHERE n_tokens >= $w
         ), dup AS (
           SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2
         ), marked AS (
           SELECT wi.doc_id, wi.i, wi.i + ${w - 1} AS e
           FROM wins wi JOIN dup USING (fp)
         ), isl AS (
           SELECT doc_id, i, e,
             CASE WHEN i > coalesce(max(e) OVER (PARTITION BY doc_id
                 ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
               THEN 1L ELSE 0L END AS opens
           FROM marked
         ), isl2 AS (
           SELECT doc_id, i, e,
             sum(opens) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM isl)
         SELECT doc_id, CAST(island AS INT) AS span_id,
           min(i) AS span_start, max(e) AS span_end,
           max(e) - min(i) + 1 AS span_tokens,
           count(*) AS n_windows
         FROM isl2 GROUP BY doc_id, island
         ORDER BY doc_id, span_id"""
  }

  /** t30 Spark-dialect replay — the t18 bigram spelling with the KN
    * count frames; discount from [[TextOps.T30Discount]]. */
  private lazy val t30Sql: String = {
    val d = TextOps.T30Discount
    s"""WITH toks AS (
           SELECT split(trim(text), '\\\\s+') AS tk FROM documents
         ), bg AS (
           SELECT b.w1, b.w2 FROM (
             SELECT explode(transform(sequence(1, size(tk) - 1),
               i -> struct(element_at(tk, i) AS w1,
                           element_at(tk, i + 1) AS w2))) AS b
             FROM toks WHERE size(tk) >= 2)
         ), bgc AS (
           SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT w1, sum(n12) AS c1, count(*) AS fwd FROM bgc GROUP BY 1
         ), cont AS (
           SELECT w2, count(*) AS back FROM bgc GROUP BY 1
         ), tot AS (SELECT count(*) AS nb FROM bgc
         ), scored AS (
           SELECT b.w1, b.w2, b.n12,
             floor((greatest(CAST(b.n12 AS DOUBLE) - $d, 0.0D)
                 / CAST(c.c1 AS DOUBLE)
               + (($d * CAST(c.fwd AS DOUBLE)) / CAST(c.c1 AS DOUBLE))
                 * (CAST(n.back AS DOUBLE) / CAST(t.nb AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS p_kn
           FROM bgc b JOIN ctx c USING (w1) JOIN cont n USING (w2)
           CROSS JOIN tot t)
         SELECT CAST(row_number() OVER (ORDER BY n12 DESC, w1, w2) AS INT)
             AS rk, w1, w2, n12, p_kn
         FROM scored ORDER BY n12 DESC, w1, w2 LIMIT 20"""
  }

  /** x22 Spark-dialect replay — x10's offsets chain exploded to the
    * occupied sequences (Spark's `sequence` is inclusive), then one
    * (seq_id) aggregate. All-integer math. */
  private lazy val x22Sql: String = {
    val B = Sampling.X22Budget
    // raw interpolator: the s-interpolator would process the \\ escape
    // and halve the regex's backslashes
    raw"""WITH n AS (
         SELECT doc_id, CAST(size(split(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
         FROM documents
       ), c AS (
         SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS BIGINT) AS start_tok
         FROM n
       ), m AS (
         SELECT n_tokens, start_tok,
           ((start_tok + n_tokens - 1) DIV $B) - (start_tok DIV $B) + 1
             AS n_seqs
         FROM c WHERE n_tokens >= 1
       ), ex AS (
         SELECT n_tokens, start_tok, n_seqs,
           explode(sequence(start_tok DIV $B,
             start_tok DIV $B + n_seqs - 1)) AS seq_id
         FROM m)
       SELECT seq_id, n_tokens_filled, n_docs, n_fragments,
         n_tokens_filled = $B AS full
       FROM (
         SELECT seq_id,
           CAST(sum(least(start_tok + n_tokens, (seq_id + 1) * $B)
             - greatest(start_tok, seq_id * $B)) AS BIGINT)
             AS n_tokens_filled,
           count(*) AS n_docs,
           sum(CASE WHEN n_seqs > 1 THEN 1L ELSE 0L END) AS n_fragments
         FROM ex GROUP BY seq_id)
       ORDER BY seq_id"""
  }

  /** v05 Spark-dialect replay — identical statement shape to the
    * DuckDB oracle (floor-then-sum nano KL terms, closed-form absent
    * mass); only explode/split spellings differ. */
  private lazy val v05Sql: String =
    """WITH tok AS (
         SELECT source, explode(split(trim(text), '\\s+')) AS w FROM documents
       ), st AS (
         SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
       ), g AS (SELECT w, sum(c) AS cg FROM st GROUP BY 1),
       ts AS (SELECT source, sum(c) AS ns FROM st GROUP BY 1),
       nn AS (SELECT sum(c) AS n FROM st),
       pq AS (
         SELECT source, cg, ns, n,
           CAST(c AS DOUBLE) / CAST(ns AS DOUBLE) AS p,
           CAST(cg AS DOUBLE) / CAST(n AS DOUBLE) AS q
         FROM st JOIN g USING (w) JOIN ts USING (source) CROSS JOIN nn
       ), terms AS (
         SELECT source, cg, ns, n,
           CAST(floor(p * ln(p / ((p + q) / 2.0D)) * 1e9 + 0.5) AS BIGINT)
             AS kp_nano,
           CAST(floor(q * ln(q / ((p + q) / 2.0D)) * 1e9 + 0.5) AS BIGINT)
             AS kq_nano
         FROM pq)
       SELECT source, max(ns) AS n_tokens, count(*) AS vocab,
         floor(((CAST(sum(kp_nano) AS DOUBLE) / 1e9) * 0.5D
           + ((CAST(sum(kq_nano) AS DOUBLE) / 1e9)
              + (1.0D - CAST(sum(cg) AS DOUBLE) / CAST(max(n) AS DOUBLE))
                * ln(2.0D)) * 0.5D) * 1e6 + 0.5) / 1e6 AS jsd
       FROM terms GROUP BY source ORDER BY source"""

  /** t31 Spark-dialect replay — t26's `graft_window_hashes` kernel
    * (the SAME JVM loop the engine folds with) + the x01 md5 split
    * rule; train fingerprints DISTINCT, eval windows LEFT-JOIN. */
  private[graft] lazy val t31Sql: String = {
    val w = TextOps.T26Width
    s"""WITH base AS (
         SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_tokens, text
         FROM documents
       ), wins AS (
         SELECT doc_id, fp FROM (
           SELECT doc_id, posexplode(graft_window_hashes(text, $w)) AS (i, fp)
           FROM base WHERE n_tokens >= $w)
       ), spl AS (
         SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '0d'
                THEN 'test'
                WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '1a'
                THEN 'val' ELSE 'train' END AS split
         FROM documents
       ), trainfp AS (
         SELECT DISTINCT fp FROM wins JOIN spl USING (doc_id)
         WHERE split = 'train'
       ), ev AS (
         SELECT doc_id, fp FROM wins JOIN spl USING (doc_id)
         WHERE split = 'test'
       ), rep AS (
         SELECT e.doc_id, count(*) AS n_windows,
           sum(CASE WHEN tf.fp IS NOT NULL THEN 1L ELSE 0L END)
             AS n_memorized
         FROM ev e LEFT JOIN trainfp tf ON e.fp = tf.fp
         GROUP BY e.doc_id)
       SELECT doc_id, n_windows, n_memorized,
         CAST(floor(n_memorized * 1000.0 / n_windows + 0.5) AS BIGINT)
           AS memorized_milli
       FROM rep ORDER BY doc_id"""
  }

  /** d16 Spark-dialect replay — band candidates through the
    * registered `graft_minhash_bands` kernel, ground truth from the
    * hashed-shingle inverted index (the engine's own plan shape, as
    * SQL text); threshold single-sourced from
    * [[Dedup.D16MinJaccard]]. */
  private lazy val d16Sql: String = {
    val minJ = graft.operators.Dedup.D16MinJaccard
    s"""WITH $docsCte,
       banded AS (
         SELECT doc_id, band, key FROM (
           SELECT doc_id, graft_minhash_bands(sh) AS bands FROM docs)
         LATERAL VIEW posexplode(bands) t AS band, key),
       cand AS (
         SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM banded x JOIN banded y
           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       ex AS (SELECT doc_id, size(sh) AS n, explode(sh) AS shingle FROM docs),
       ix AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
           count(*) AS inter
         FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4),
       truth AS (
         SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 4)
             AS jaccard
         FROM ix)
       SELECT bin, n_pairs, n_caught,
         CAST(floor(n_caught * 1000.0 / n_pairs + 0.5) AS BIGINT)
           AS recall_milli
       FROM (
         SELECT CAST(least(floor(t.jaccard * 10), 9.0D) AS INT) AS bin,
           count(*) AS n_pairs,
           sum(CASE WHEN c.doc_a IS NOT NULL THEN 1L ELSE 0L END) AS n_caught
         FROM truth t LEFT JOIN cand c
           ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
         WHERE t.jaccard >= $minJ
         GROUP BY 1)
       ORDER BY bin"""
  }

  /** d19 Spark-dialect replay — the parametric band-fold kernel faces
    * (`graft_minhash_mins` + `graft_band_keys`, the SAME JVM fold the
    * engine runs) per geometry, candidates from the (band, key)
    * self-joins, d16's string-shingle truth at D19Tau. */
  private lazy val d19Sql: String = {
    val tau = graft.operators.Dedup.D19Tau
    val geoms = graft.operators.Dedup.D19Bands
    val geomCtes = geoms.map { b =>
      s"""banded_g$b AS (
         SELECT doc_id, band, key FROM (
           SELECT doc_id, graft_band_keys(mins, $b) AS bands FROM minsd)
         LATERAL VIEW posexplode(bands) t AS band, key),
       cand_g$b AS (
         SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM banded_g$b x JOIN banded_g$b y
           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)"""
    }.mkString(",\n       ")
    val arms = geoms.map { b =>
      s"""SELECT $b AS bands, ${64 / b} AS rows_per_band,
             (SELECT CAST(count(1) AS BIGINT) FROM cand_g$b) AS n_candidates,
             (SELECT n_truth FROM tcount) AS n_truth,
             (SELECT CAST(count(1) AS BIGINT)
              FROM cand_g$b c JOIN truth t
                ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_caught"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH $docsCte,
       minsd AS (SELECT doc_id, graft_minhash_mins(sh) AS mins FROM docs),
       $geomCtes,
       ex AS (SELECT doc_id, size(sh) AS n, explode(sh) AS shingle FROM docs),
       ix AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
           count(*) AS inter
         FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4),
       truth AS (
         SELECT doc_a, doc_b FROM (
           SELECT doc_a, doc_b,
             round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE),
               4) AS jaccard
           FROM ix)
         WHERE jaccard >= $tau),
       tcount AS (SELECT CAST(count(1) AS BIGINT) AS n_truth FROM truth)
       SELECT bands, rows_per_band, n_candidates, n_truth, n_caught,
         CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(n_caught * 1000.0 / n_truth + 0.5) AS BIGINT)
         END AS recall_milli,
         CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(n_caught * 1000.0 / n_candidates + 0.5)
                AS BIGINT)
         END AS precision_milli
       FROM (
         $arms)
       ORDER BY bands"""
  }

  /** s29 Spark-dialect replay — the s04 bucket kernel reduced to cell
    * occupancies; log₂ bin via `length(bin(c)) − 1` (exact integer on
    * both engines). */
  private lazy val s29Sql: String =
    s"""WITH $embCte,
       ${bucketsCte(nTables = 1, nPlanes = 4)},
       cells AS (
         SELECT bucket, count(*) AS c FROM buckets GROUP BY bucket
       ), summ AS (
         SELECT count(*) AS n_cells, sum(c) AS n_vectors,
           max(c) AS max_cell, min(c) AS min_cell, sum(c * c) AS ss
         FROM cells
       ), hist AS (
         SELECT 'cells_log2_' || lpad(CAST(length(bin(c)) - 1 AS STRING),
             2, '0') AS metric,
           count(*) AS value
         FROM cells GROUP BY 1
       ), mets AS (
         SELECT 'n_cells' AS metric, n_cells AS value FROM summ
         UNION ALL SELECT 'n_vectors', n_vectors FROM summ
         UNION ALL SELECT 'max_cell', max_cell FROM summ
         UNION ALL SELECT 'min_cell', min_cell FROM summ
         UNION ALL SELECT 'imbalance_milli',
           CAST(floor(CAST(n_cells AS DOUBLE) * CAST(ss AS DOUBLE)
             / (CAST(n_vectors AS DOUBLE) * CAST(n_vectors AS DOUBLE))
             * 1000.0 + 0.5) AS BIGINT)
         FROM summ)
       SELECT metric, value FROM
         (SELECT * FROM mets UNION ALL SELECT * FROM hist)
       ORDER BY metric"""

  /** v06 Spark-dialect replay — d01's fingerprint rule + the ccTail
    * CC / keep-best machinery + t26's `graft_window_hashes` coverage,
    * each stage a scalar aggregate (empty stages emit 0 rows — the
    * q35 lesson). */
  private lazy val v06Sql: String = {
    val w = TextOps.T26Width
    s"""WITH $docsCte,
       ${jaccardPairsCte(0.7)},
       ${ccTail(8)},
       vbase AS (
         SELECT doc_id, n_chars,
           md5(lower(regexp_replace(trim(text), '\\\\s+', ' '))) AS fp,
           CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens
         FROM documents
       ), exact AS (
         SELECT 'exact_dedup' AS stage,
           coalesce(sum(CASE WHEN rk > 1 THEN 1L ELSE 0L END), 0L)
             AS docs_affected,
           coalesce(sum(CASE WHEN rk > 1 THEN n_tokens ELSE 0L END), 0L)
             AS tokens_removed
         FROM (SELECT n_tokens, row_number() OVER (PARTITION BY fp
                 ORDER BY doc_id) AS rk FROM vbase)
       ), vkeep AS (
         SELECT cluster, kept FROM (
           SELECT c.cluster, d.doc_id AS kept,
             row_number() OVER (PARTITION BY c.cluster
               ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
           FROM clusters c JOIN documents d ON c.id = d.doc_id)
         WHERE rk = 1
       ), near AS (
         SELECT 'near_dedup' AS stage,
           coalesce(sum(CASE WHEN c.id <> k.kept THEN 1L ELSE 0L END), 0L)
             AS docs_affected,
           coalesce(sum(CASE WHEN c.id <> k.kept THEN b.n_tokens
             ELSE 0L END), 0L) AS tokens_removed
         FROM clusters c JOIN vkeep k ON c.cluster = k.cluster
         JOIN vbase b ON b.doc_id = c.id
       ), wbase AS (
         SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_tokens, text
         FROM documents
       ), wins AS (
         SELECT doc_id, i, fp FROM (
           SELECT doc_id, posexplode(graft_window_hashes(text, $w)) AS (i, fp)
           FROM wbase WHERE n_tokens >= $w)
       ), dup AS (
         SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2
       ), marked AS (
         SELECT wi.doc_id, wi.i, wi.i + ${w - 1} AS e
         FROM wins wi JOIN dup USING (fp)
       ), visl AS (
         SELECT doc_id,
           greatest(0, e - greatest(i - 1,
             coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)))
             AS contrib
         FROM marked
       ), vcov AS (
         SELECT doc_id, sum(contrib) AS covered FROM visl GROUP BY doc_id
       ), vspan AS (
         SELECT 'span_dedup' AS stage,
           coalesce(sum(CASE WHEN covered > 0 THEN 1L ELSE 0L END), 0L)
             AS docs_affected,
           coalesce(sum(covered), 0L) AS tokens_removed
         FROM vcov)
       SELECT stage, docs_affected, tokens_removed FROM (
         SELECT * FROM exact UNION ALL
         SELECT * FROM near UNION ALL
         SELECT * FROM vspan)
       ORDER BY stage"""
  }

  /** d17 Spark-dialect replay — the d04 `graft_simhash` signatures
    * with the cross-split best-match tail (split from
    * [[graft.operators.Dedup.D12SplitAt]]). */
  private lazy val d17Sql: String = {
    val split = graft.operators.Dedup.D12SplitAt
    s"""WITH $docsCte,
       sigs AS (SELECT doc_id, graft_simhash(sh) AS sig FROM docs),
       m AS (
         SELECT b.doc_id AS doc_id, a.doc_id AS store_id,
           bit_count(a.sig ^ b.sig) AS hamming
         FROM sigs a JOIN sigs b
           ON a.doc_id < $split AND b.doc_id >= $split
         WHERE bit_count(a.sig ^ b.sig) <= 3)
       SELECT doc_id, best_match, hamming, n_matches FROM (
         SELECT doc_id, store_id AS best_match, hamming,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY hamming ASC, store_id ASC) AS rk,
           count(*) OVER (PARTITION BY doc_id) AS n_matches
         FROM m)
       WHERE rk = 1 ORDER BY doc_id"""
  }

  /** t32 Spark-dialect replay — t14's `graft_bpe_apply` kernel with
    * the per-language fertility tail. */
  private lazy val t32Sql: String = {
    val (lefts, rights) = mergeArrays(TextOps.pinnedMerges)
    s"""WITH words AS (
           SELECT lang, word FROM documents
           LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS word),
         vocab AS (SELECT DISTINCT word FROM words),
         encoded AS (
           SELECT word,
             CAST(size(graft_bpe_apply(word, $lefts, $rights)) AS BIGINT) AS n_sub
           FROM vocab),
         agg AS (
           SELECT w.lang, count(1) AS n_words, sum(e.n_sub) AS n_bpe_tokens
           FROM words w JOIN encoded e ON w.word = e.word
           GROUP BY w.lang)
         SELECT lang, n_words, n_bpe_tokens,
           CAST(floor(CAST(n_bpe_tokens AS DOUBLE) * 1000.0
             / CAST(n_words AS DOUBLE) + 0.5) AS BIGINT) AS fertility_milli
         FROM agg ORDER BY lang"""
  }

  /** s30 Spark-dialect replay — the s26 shortlist chain ranked once,
    * one re-rank arm per depth from [[Similarity.S30Depths]],
    * intersected with the exact top-3 truth. */
  private lazy val s30Sql: String = {
    val depths = Similarity.S30Depths
    val nPossible = 5 * 3
    val arms = depths.map { d =>
      s"""SELECT $d AS depth, count(1) AS n_hits
           FROM (
             SELECT q_id, n_id FROM (
               SELECT rr.q_id, rr.n_id,
                 row_number() OVER (PARTITION BY rr.q_id
                   ORDER BY rr.cos DESC, rr.n_id ASC) AS rk
               FROM (
                 SELECT c.q_id, c.n_id,
                   round(graft_dot(qe.v, ae.v) / (qe.nrm * ae.nrm), 6) AS cos
                 FROM (SELECT q_id, n_id FROM hamrk WHERE crk <= $d) c
                 JOIN n qe ON qe.vec_id = c.q_id
                 JOIN n ae ON ae.vec_id = c.n_id) rr)
             WHERE rk <= 3) got
           JOIN truth t ON got.q_id = t.q_id AND got.n_id = t.n_id"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), n AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e
         ), sg AS (
           SELECT vec_id,
             aggregate(transform(sequence(0, 31),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS lo,
             aggregate(transform(sequence(32, 63),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i - 32 AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS hi
           FROM e
         ), ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(a.lo ^ q.lo) + bit_count(a.hi ^ q.hi) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5
         ), hamrk AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY hamming ASC, n_id ASC) AS crk
           FROM ham
         ), truth AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(graft_dot(q.v, a.v) / (q.nrm * a.nrm), 6)
                   DESC, a.vec_id ASC) AS rk
             FROM n q JOIN n a ON a.vec_id <> q.vec_id
             WHERE q.vec_id < 5)
           WHERE rk <= 3)
         SELECT depth, n_hits, CAST($nPossible AS BIGINT) AS n_possible,
           CAST(floor(CAST(n_hits AS DOUBLE) * 1000.0 / $nPossible.0 + 0.5)
             AS BIGINT) AS recall_milli
         FROM (
           $arms)
         ORDER BY depth"""
  }

  /** t33 Spark-dialect replay — 0-based array indexing and
    * explode(sequence(...)) in place of DuckDB's 1-based
    * list_slice/range; same md5 of the space-joined trigram. */
  private lazy val t33Sql: String =
    raw"""WITH tk AS (
           SELECT doc_id, split(trim(text), '\\s+') AS t FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(concat_ws(' ', t[i], t[i + 1], t[i + 2])) AS fp
           FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 3)) AS i
                 FROM tk WHERE size(t) >= 3)
         ), fo AS (
           SELECT fp, min(doc_id) AS first_doc FROM tri GROUP BY fp
         ), pd AS (
           SELECT doc_id, count(1) AS n_ngrams,
             sum(CASE WHEN first_doc = doc_id THEN 1L ELSE 0L END)
               AS n_novel
           FROM tri JOIN fo USING (fp) GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(n_ngrams, 0L) AS n_ngrams,
           coalesce(n_novel, 0L) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0L) = 0L THEN 1000L
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""

  /** t34 Spark-dialect replay — the t33 trigram CTE split at the
    * fixture cut; batch docs LEFT-join the store per distinct
    * trigram. */
  private lazy val t34Sql: String = {
    val frac = TextOps.T34SplitFrac
    raw"""WITH cut AS (
           SELECT CAST(floor(max(doc_id) * $frac) AS BIGINT) AS c
           FROM documents
         ), tk AS (
           SELECT doc_id, split(trim(text), '\\s+') AS t FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(concat_ws(' ', t[i], t[i + 1], t[i + 2])) AS fp
           FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 3)) AS i
                 FROM tk WHERE size(t) >= 3)
         ), store AS (
           SELECT DISTINCT fp FROM tri, cut WHERE doc_id < c
         ), batch AS (
           SELECT doc_id FROM documents, cut WHERE doc_id >= c
         ), pd AS (
           SELECT tri.doc_id, count(1) AS n_ngrams,
             sum(CASE WHEN s.fp IS NULL THEN 1L ELSE 0L END) AS n_novel
           FROM tri JOIN cut ON tri.doc_id >= cut.c
           LEFT JOIN store s ON s.fp = tri.fp
           GROUP BY tri.doc_id)
         SELECT b.doc_id,
           coalesce(n_ngrams, 0L) AS n_ngrams,
           coalesce(n_novel, 0L) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0L) = 0L THEN 1000L
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM batch b LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""
  }

  /** v08 Spark-dialect replay — x21's assignment CTE + t33's trigram
    * CTE keyed by split, val/test totalized via a VALUES frame. */
  private[graft] lazy val v08Sql: String =
    raw"""WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
           FROM documents
         ), asg AS (
           SELECT doc_id, fp,
             CASE WHEN substring(md5(fp), 1, 2) < '0d' THEN 'test'
                  WHEN substring(md5(fp), 1, 2) < '1a' THEN 'val'
                  ELSE 'train' END AS split
           FROM f
         ), multi AS (
           SELECT count(1) AS v FROM (
             SELECT fp FROM (SELECT DISTINCT fp, split FROM asg)
             GROUP BY fp HAVING count(1) > 1)
         ), tk AS (
           SELECT doc_id, split(trim(text), '\\s+') AS t FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(concat_ws(' ', t[i], t[i + 1], t[i + 2])) AS fp3
           FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 3)) AS i
                 FROM tk WHERE size(t) >= 3)
         ), sfp AS (
           SELECT DISTINCT asg.split, tri.fp3
           FROM tri JOIN asg ON tri.doc_id = asg.doc_id
         ), tr AS (SELECT fp3 FROM sfp WHERE split = 'train'
         ), lk AS (
           SELECT split, count(1) AS n,
             sum(CASE WHEN t.fp3 IS NOT NULL THEN 1L ELSE 0L END) AS h
           FROM sfp LEFT JOIN tr t USING (fp3)
           WHERE split IN ('val', 'test') GROUP BY split
         ), lk2 AS (
           SELECT s.split, coalesce(n, 0L) AS n, coalesce(h, 0L) AS h
           FROM (VALUES ('val'), ('test')) AS s(split)
           LEFT JOIN lk ON lk.split = s.split)
         SELECT metric, value FROM (
           SELECT 'content_fps_multi_split' AS metric, v AS value FROM multi
           UNION ALL SELECT concat(split, '_ngrams'), n FROM lk2
           UNION ALL SELECT concat(split, '_ngrams_in_train'), h FROM lk2
           UNION ALL SELECT concat(split, '_leak_milli'),
             CASE WHEN n = 0L THEN 0L
                  ELSE CAST(floor(h * 1000.0 / n + 0.5) AS BIGINT) END
           FROM lk2)
         ORDER BY metric"""

  /** v07 Spark-dialect replay — the same 1-row exact aggregate
    * unpivoted. */
  private lazy val v07Sql: String =
    raw"""WITH d AS (
           SELECT CAST(size(split(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(n_chars AS BIGINT) AS n_chars, lang, source,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
           FROM documents
         ), a AS (
           SELECT count(1) AS n_docs,
             sum(n_tokens) AS n_tokens,
             sum(n_chars) AS n_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_content,
             min(n_tokens) AS tokens_min,
             max(n_tokens) AS tokens_max
           FROM d)
         SELECT stat, value FROM (
           SELECT 'n_docs' AS stat, n_docs AS value FROM a
           UNION ALL SELECT 'n_tokens', n_tokens FROM a
           UNION ALL SELECT 'n_chars', n_chars FROM a
           UNION ALL SELECT 'n_langs', n_langs FROM a
           UNION ALL SELECT 'n_sources', n_sources FROM a
           UNION ALL SELECT 'n_distinct_content', n_distinct_content FROM a
           UNION ALL SELECT 'tokens_min', tokens_min FROM a
           UNION ALL SELECT 'tokens_max', tokens_max FROM a
           UNION ALL SELECT 'dup_docs', n_docs - n_distinct_content FROM a
           UNION ALL SELECT 'dup_milli',
             CAST(floor((n_docs - n_distinct_content) * 1000.0 / n_docs
               + 0.5) AS BIGINT) FROM a
           UNION ALL SELECT 'tokens_avg_milli',
             CAST(floor(n_tokens * 1000.0 / n_docs + 0.5) AS BIGINT) FROM a)
         ORDER BY stat"""

  /** s31 Spark-dialect replay — the s26 shortlist chain ranked once,
    * every candidate scored ONCE by the pinned diagonal reranker
    * (query tower pre-weighted via an indexed transform, then one
    * graft_dot — the engine's exact grouping), arms filter the
    * scored frame, truth is the scorer-exact top-3. */
  /** s36 MaxSim re-rank — the s31 signature/Hamming shortlist CTEs at
    * depth S36NCand, then the late interaction unrolled: S36Tokens²
    * graft_dot calls over per-token transform() reweightings (the same
    * pinned diagonal constants the engine interpolates), greatest per
    * query token, left-associated token sum, 6-dp round. */
  private lazy val s36Sql: String = {
    val T = Similarity.S36Tokens
    val per = Similarity.S36TokPeriod
    val st = Similarity.S36TokStride
    val dv = Similarity.S36TokDivisor
    val nCand = Similarity.S36NCand
    def tok(e: String, t: Int) =
      s"""transform($e.v, (x, i) ->
             x * (1.0D + CAST((i + ${st * t}) % $per AS DOUBLE) / ${dv}D))"""
    val sumT = (0 until T).map { t =>
      "greatest(" +
        (0 until T).map(u => s"graft_dot(${tok("qe", t)}, ${tok("ae", u)})")
          .mkString(",\n             ") + ")"
    }.mkString(" + ")
    s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), sg AS (
           SELECT vec_id,
             aggregate(transform(sequence(0, 31),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS lo,
             aggregate(transform(sequence(32, 63),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i - 32 AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS hi
           FROM e
         ), ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(a.lo ^ q.lo) + bit_count(a.hi ^ q.hi) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5
         ), hamrk AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY hamming ASC, n_id ASC) AS crk
           FROM ham
         ), sc AS (
           SELECT c.q_id, c.n_id,
             round($sumT, 6) AS maxsim
           FROM (SELECT q_id, n_id FROM hamrk WHERE crk <= $nCand) c
           JOIN e qe ON qe.vec_id = c.q_id
           JOIN e ae ON ae.vec_id = c.n_id)
         SELECT q_id, rk, n_id, maxsim FROM (
           SELECT q_id, n_id, maxsim,
             row_number() OVER (PARTITION BY q_id
               ORDER BY maxsim DESC, n_id ASC) AS rk
           FROM sc)
         WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  private lazy val s31Sql: String = {
    val depths = Similarity.S30Depths
    val dMax = depths.max
    val nPossible = 5 * 3
    val wPeriod = Similarity.S31WeightPeriod
    val wDiv = Similarity.S31WeightDivisor
    val arms = depths.map { d =>
      s"""SELECT $d AS depth, count(1) AS n_hits
           FROM (
             SELECT q_id, n_id FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY score DESC, n_id ASC) AS rk
               FROM sc WHERE crk <= $d)
             WHERE rk <= 3) got
           JOIN truth t ON got.q_id = t.q_id AND got.n_id = t.n_id"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), qw AS (
           SELECT vec_id AS q_id,
             transform(v, (x, i) ->
               x * (1.0D + CAST(i % $wPeriod AS DOUBLE) / ${wDiv}D)) AS wq
           FROM e WHERE vec_id < 5
         ), sg AS (
           SELECT vec_id,
             aggregate(transform(sequence(0, 31),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS lo,
             aggregate(transform(sequence(32, 63),
               i -> IF(v[i] > 0D,
                 CAST(pow(2.0D, CAST(i - 32 AS DOUBLE)) AS BIGINT), 0L)),
               0L, (acc, x) -> acc + x) AS hi
           FROM e
         ), ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(a.lo ^ q.lo) + bit_count(a.hi ^ q.hi) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5
         ), hamrk AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY hamming ASC, n_id ASC) AS crk
           FROM ham
         ), sc AS (
           SELECT c.q_id, c.n_id, c.crk,
             round(graft_dot(qt.wq, ae.v), 6) AS score
           FROM (SELECT q_id, n_id, crk FROM hamrk WHERE crk <= $dMax) c
           JOIN qw qt ON qt.q_id = c.q_id
           JOIN e ae ON ae.vec_id = c.n_id
         ), truth AS (
           SELECT q_id, n_id FROM (
             SELECT qt.q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY qt.q_id
                 ORDER BY round(graft_dot(qt.wq, a.v), 6) DESC,
                          a.vec_id ASC) AS rk
             FROM qw qt JOIN e a ON a.vec_id <> qt.q_id)
           WHERE rk <= 3)
         SELECT depth, n_hits, CAST($nPossible AS BIGINT) AS n_possible,
           CAST(floor(CAST(n_hits AS DOUBLE) * 1000.0 / $nPossible.0 + 0.5)
             AS BIGINT) AS recall_milli
         FROM (
           $arms)
         ORDER BY depth"""
  }

  /** d18 Spark-dialect replay — one hashed-shingle Jaccard pair CTE
    * at min(τ), one suffixed [[ccTail]] instance per swept threshold,
    * counts per arm. */
  private lazy val d18Sql: String = {
    val taus = graft.operators.Dedup.D18Taus
    def deci(t: Double) = math.floor(t * 10 + 0.5).toInt
    val ccParts = taus.map { tau =>
      val d = deci(tau)
      s"""pairs$d AS (SELECT pa, pb FROM jpairs WHERE j >= $tau),
         ${ccTail(8, s"t$d", s"pairs$d")}"""
    }.mkString(",\n         ")
    val arms = taus.map { tau =>
      val d = deci(tau)
      s"""SELECT $d AS tau_deci,
             (SELECT count(1) FROM jpairs WHERE j >= $tau) AS n_pairs,
             count(DISTINCT cluster) AS n_clusters,
             count(1) - count(DISTINCT cluster) AS n_removed
           FROM clusterst$d"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH $docsCte,
         jpairs AS (
           SELECT a.doc_id AS pa, b.doc_id AS pb, $jaccardExpr AS j
           FROM docs a JOIN docs b ON a.doc_id < b.doc_id
           WHERE $jaccardExpr >= ${taus.min}),
         $ccParts
         SELECT tau_deci, n_pairs, n_clusters, n_removed FROM (
           $arms)
         ORDER BY tau_deci"""
  }

  /** The kernel-bound forms; appended to SparkEntry.sparkSql. */
  lazy val forms: Map[String, String] = Map(
    "d18_threshold_curve" -> d18Sql,
    "s30_rerank_depth" -> s30Sql,
    "s31_two_tower_rerank" -> s31Sql,
    "s36_maxsim_rerank" -> s36Sql,
    "s38_ann_nprobe_sweep" -> s38Sql,
    "s32_embedding_drift" -> s32Sql,
    "s33_ann_filtered" -> s33Sql,
    "s34_semantic_admission" -> s34Sql,
    "t33_ngram_novelty" -> t33Sql,
    "t34_incremental_novelty" -> t34Sql,
    "v07_corpus_datasheet" -> v07Sql,
    "v08_split_leakage" -> v08Sql,
    "t32_bpe_fertility" -> t32Sql,
    "d17_incremental_simhash" -> d17Sql,
    "s29_ann_index_stats" -> s29Sql,
    "v06_dedup_impact" -> v06Sql,
    "x22_pack_efficiency" -> x22Sql,
    "v05_vocab_divergence" -> v05Sql,
    "t31_memorization" -> t31Sql,
    "d16_lsh_scurve" -> d16Sql,
    "d19_band_plan" -> d19Sql,
    "d14_dup_spans" -> d14Sql,
    "t30_kneser_ney" -> t30Sql,
    "s27_matryoshka_eval" -> s27Sql,
    "s28_ann_tombstones" -> s28Sql,
    "s26_ann_binary" -> s26Sql,
    "t25_cms_counts" -> t25Sql,
    "t26_span_coverage" -> t26Sql,
    "s17_ann_graph_lsh" -> s17Sql,
    "s18_ann_graph_insert" -> s18Sql,
    "s19_ann_graph_refined" -> s19Sql,
    "s20_ann_graph_insert_recip" -> s20Sql,
    "d02_minhash_lsh" -> d02Sql,
    "d03_ngram_jaccard" -> d03Sql,
    "d12_incremental_neardup" -> d12Sql,
    "d04_simhash" -> d04Sql,
    "d05_dup_clusters" -> d05Sql,
    "d06_capped_jaccard" -> d06Sql,
    "d07_embedding_clusters" -> d07Sql,
    "d08_keep_best" -> d08Sql,
    "d09_embedding_clusters_lsh" -> d09Sql,
    "d10_keep_best_lsh" -> d10Sql,
    "m03_media_features" -> m03Sql,
    "q20_approx_distinct" -> q20Sql,
    "q32_approx_percentiles" -> q32Sql,
    "s03_lsh_pairs" -> s03Sql,
    "s03c_lsh_pairs_capped" -> s03cSql,
    "s04_ann_ivf" -> s04Sql,
    "s37_index_compaction" -> s37Sql,
    "s05_ann_kmeans_ivf" -> s05Sql,
    "s09_ann_pq" -> s09Sql,
    "s39_pq_distortion" -> s39Sql,
    "s10_ann_ivfpq" -> s10Sql,
    "s11_ann_pq_fitserve" -> s09Sql, // serves the same pinned model as s09
    "s12_pca_project" -> s12Sql,
    "s13_ann_opq" -> s13Sql,
    "s14_semdedup" -> s14Sql,
    "t13_bpe_merges" -> t13Sql,
    "t14_bpe_encode" -> t14Sql,
    "t27_unigram_lm" -> t27Sql,
    "s21_ann_recall" -> s21Sql,
    "s22_bitext_mine" -> s22Sql,
    "s23_bitext_mine_lsh" -> s23Sql,
    "s24_mmr_rerank" -> s24Sql,
    "s25_ann_rank_eval" -> s25Sql,
    "x14_cluster_sample" -> x14Sql,
    "x15_quality_classifier" -> x15Sql)

  /** t27: the 2-round unigram-LM hard-EM loop unrolled (the t13
    * discipline) — seed vocab from weighted substring counts, each
    * round's Viterbi segmentation through the registered engine
    * kernel (`graft_unigram_segment`) with the piece/score table
    * carried as piece-sorted parallel arrays (collect_list over a
    * sort-keyed struct, the same driver-state-as-literal move as
    * t13's merge cross-joins), add-1 re-scoring between rounds.
    * Knobs single-sourced from [[graft.operators.TextOps]] T27*. */
  private lazy val t27Sql: String = {
    val T = graft.operators.TextOps
    val P = T.T27MaxPieceLen
    val S = T.T27SeedMulti
    val K = T.T27K
    require(T.T27Rounds == 2, "t27 Spark form unrolls exactly 2 rounds")
    s"""WITH words AS (
           SELECT w, CAST(count(1) AS BIGINT) AS n FROM (
             SELECT word AS w FROM documents
             LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS word)
           GROUP BY w),
         occ AS (
           SELECT substr(w, i, l) AS piece, n
           FROM words
           LATERAL VIEW explode(sequence(1, length(w))) ti AS i
           LATERAL VIEW explode(sequence(1, $P)) tl AS l
           WHERE i + l - 1 <= length(w)),
         f0 AS (SELECT piece, CAST(sum(n) AS BIGINT) AS f
                FROM occ GROUP BY piece),
         v0 AS (
           SELECT piece, f FROM f0 WHERE length(piece) = 1
           UNION ALL
           SELECT piece, f FROM (
             SELECT piece, f,
               row_number() OVER (ORDER BY f DESC, piece ASC) AS rk
             FROM f0 WHERE length(piece) > 1) WHERE rk <= $S),
         tot0 AS (SELECT CAST(sum(f) AS BIGINT) AS t,
                         CAST(count(1) AS BIGINT) AS v FROM v0),
         a0 AS (
           SELECT transform(arr, x -> x.piece) AS ps,
                  transform(arr, x ->
                    ln(CAST(x.f AS DOUBLE) / CAST(t AS DOUBLE))) AS ss
           FROM (SELECT array_sort(collect_list(named_struct(
                   'piece', piece, 'f', f))) AS arr FROM v0)
           CROSS JOIN tot0),
         seg1 AS (
           SELECT n, piece FROM words CROSS JOIN a0
           LATERAL VIEW explode(graft_unigram_segment(w, ps, ss)) t AS piece),
         c1 AS (SELECT piece, CAST(sum(n) AS BIGINT) AS c
                FROM seg1 GROUP BY piece),
         t1 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1),
         a1 AS (
           SELECT transform(arr, x -> x.piece) AS ps,
                  transform(arr, x -> ln(CAST(x.c + 1 AS DOUBLE) /
                    CAST(t1.t + tot0.v AS DOUBLE))) AS ss
           FROM (SELECT array_sort(collect_list(named_struct(
                   'piece', v.piece,
                   'c', coalesce(c.c, CAST(0 AS BIGINT))))) AS arr
                 FROM v0 v LEFT JOIN c1 c ON v.piece = c.piece)
           CROSS JOIN t1 CROSS JOIN tot0),
         seg2 AS (
           SELECT n, piece FROM words CROSS JOIN a1
           LATERAL VIEW explode(graft_unigram_segment(w, ps, ss)) t AS piece),
         c2 AS (SELECT piece, CAST(sum(n) AS BIGINT) AS c
                FROM seg2 GROUP BY piece),
         t2 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c2)
         SELECT rk, piece, n_uses, logp FROM (
           SELECT piece, c AS n_uses,
             floor(ln(CAST(c + 1 AS DOUBLE) /
               CAST(t2.t + tot0.v AS DOUBLE))*1e4 + 0.5)/1e4 AS logp,
             row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
           FROM c2 CROSS JOIN t2 CROSS JOIN tot0)
         WHERE rk <= $K ORDER BY rk"""
  }

  /** s25: the rank-eval tail over the Spark-dialect member replays —
    * mirrors OracleSqlSim.s25OracleSql via the shared generator. */
  private lazy val s25Sql: String =
    OracleSqlHelpers.rankEvalTailSql(OracleSqlSim.s01SparkSql, s04Sql)

  /** x15: the Spark-dialect replay — the same pinned weight literal
    * via `element_at`. Mirrors OracleSqlDx.x15OracleSql. */
  private lazy val x15Sql: String = {
    val ws = graft.operators.Curation.qualityModelMicro
      .mkString("array(", ", ", ")")
    s"""WITH fb AS (
           SELECT doc_id,
             CAST(conv(substring(md5(w), 1, 2), 16, 10) AS INT) AS f
           FROM (SELECT doc_id,
                   explode(split(trim(text), '\\\\s+')) AS w
                 FROM documents)
         ), pd AS (
           SELECT doc_id, f, count(*) AS c
           FROM fb GROUP BY doc_id, f
         ), sc AS (
           SELECT doc_id, sum(c) AS n_tokens,
             sum(c * element_at($ws, f + 1)) AS score_micro
           FROM pd GROUP BY doc_id)
         SELECT doc_id, n_tokens, score_micro,
           floor((CAST(score_micro AS DOUBLE) / 1e6 /
             CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4 AS score,
           (score_micro > 0) AS keep
         FROM sc ORDER BY doc_id"""
  }

  /** s24: the MMR replay — s01-shape candidates + pair sims via
    * `graft_dot`, then the shared unrolled selection tail
    * ([[OracleSqlHelpers.mmrTailSql]]). */
  private lazy val s24Sql: String =
    s"""WITH $embCte,
         sc AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(graft_dot(q.v, a.v) / (q.nrm * a.nrm), 6) AS c
           FROM en q JOIN en a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5),
         cand AS (
           SELECT q_id, n_id, c FROM (
             SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id
               ORDER BY c DESC, n_id ASC) AS crk FROM sc) z
           WHERE crk <= ${Similarity.MmrCand}),
         pc AS (
           SELECT x.q_id, x.n_id AS a, y.n_id AS b,
             round(graft_dot(ex.v, ey.v) / (ex.nrm * ey.nrm), 6) AS pcos
           FROM cand x JOIN cand y
             ON y.q_id = x.q_id AND y.n_id <> x.n_id
           JOIN en ex ON ex.vec_id = x.n_id
           JOIN en ey ON ey.vec_id = y.n_id),
         ${OracleSqlHelpers.mmrTailSql(k = Similarity.MmrK, lambda = Similarity.MmrLambda)}"""

  /** s22/s23: the bitext-mining replays — cross-side micro-cosine
    * pairs (exact product for s22, the d09-regime bucket candidates
    * for s23) into the dialect-portable margin tail shared with the
    * DuckDB oracles ([[OracleSqlHelpers.bitextTailSql]]). */
  private lazy val s22Sql: String =
    s"""WITH $embCte,
         lab AS (SELECT vec_id, label % 2 AS par FROM embeddings),
         pairs AS (
           SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
             CAST(floor(round(graft_dot(es.v, et.v) / (es.nrm * et.nrm), 6)
               *1e6 + 0.5) AS BIGINT) AS c
           FROM lab s JOIN lab t ON s.par = 0 AND t.par = 1
           JOIN en es ON es.vec_id = s.vec_id
           JOIN en et ON et.vec_id = t.vec_id),
         ${OracleSqlHelpers.bitextTailSql(k = Similarity.BitextK)}"""

  private lazy val s23Sql: String =
    s"""WITH $embCte,
         ${bucketsCte(nTables = 12, nPlanes = 8)},
         ${capGuard("s23", "SELECT count(1) AS cnt FROM buckets GROUP BY tb, bucket")},
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(floor(round(graft_dot(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
               *1e6 + 0.5) AS BIGINT) AS c
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           JOIN en ea ON ea.vec_id = a.vec_id
           JOIN en eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard),
         lab AS (SELECT vec_id, label % 2 AS par FROM embeddings),
         pairs AS (
           SELECT CASE WHEN la.par = 0 THEN id_a ELSE id_b END AS src_id,
                  CASE WHEN la.par = 0 THEN id_b ELSE id_a END AS tgt_id, c
           FROM cand JOIN lab la ON la.vec_id = cand.id_a
             JOIN lab lb ON lb.vec_id = cand.id_b
           WHERE la.par <> lb.par),
         ${OracleSqlHelpers.bitextTailSql(k = Similarity.BitextK)}"""

  /** x14: the s05 argmax cell assignment + per-cell md5-pick ranking.
    * Mirrors OracleSqlDx.x14OracleSql. */
  private lazy val x14Sql: String = {
    val dts = centroidDotsArr("sv", Pinned.ivfCentroids)
    s"""WITH $normCte,
         asg AS (SELECT vec_id,
             CAST(array_position(dts, array_max(dts)) - 1 AS INT) AS cell,
             md5(CAST(vec_id AS STRING)) AS pick
           FROM (SELECT vec_id, sv, $dts AS dts FROM n))
         SELECT cell, rk, vec_id FROM (
           SELECT cell, vec_id,
             CAST(row_number() OVER (PARTITION BY cell
               ORDER BY pick ASC, vec_id ASC) AS BIGINT) AS rk
           FROM asg)
         WHERE rk <= ${Sampling.X14PerCell} ORDER BY cell, rk"""
  }

  /** s21: the recall replay composes the two member replays verbatim —
    * [[OracleSqlSim.s01SparkSql]] (exact ground truth) and [[s04Sql]]
    * (IVF serve) as derived tables — joined on (query, neighbor) and
    * reduced to hits per query. Mirrors OracleSqlSim.s21OracleSql. */
  private lazy val s21Sql: String =
    s"""WITH hits AS (
           SELECT bf.q_id, count(*) AS n_hits
           FROM (${OracleSqlSim.s01SparkSql}) bf
           JOIN ($s04Sql) iv
             ON iv.q_id = bf.q_id AND iv.n_id = bf.n_id
           GROUP BY bf.q_id
         ), qs AS (SELECT DISTINCT q_id FROM (${OracleSqlSim.s01SparkSql}))
         SELECT q_id,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           floor((CAST(coalesce(n_hits, 0) AS DOUBLE) / 3.0)*1e4 + 0.5)/1e4
             AS recall
         FROM qs LEFT JOIN hits USING (q_id) ORDER BY q_id"""
}
