package graft

import graft.operators.{Checks, Curation, Dedup, Multimodal, Pca, Pinned, Sampling, Similarity, TemporalJoins, TextOps, Warehouse}

/** GENERATED-BY-SPLIT (r14, from the monolithic SparkEntry): the
  * DuckDB oracle SQL and hand-written Spark-dialect forms for the
  * text-analysis (t*) queries —
  * [[SparkEntry.oracleSql]]/[[SparkEntry.sparkSql]] compose the
  * family maps; shared SQL builders live in [[OracleSqlHelpers]].
  * The SQL texts are verbatim moves — the r14 split diffed the
  * composed maps byte-for-byte against the pre-split dump. */
object OracleSqlText {
  import OracleSqlHelpers._

  /** t10 DuckDB replay — extracted to a val so [[t20OracleSql]] can
    * compose it as the keyword side of the RRF fusion. */
  private[graft] lazy val t10OracleSql: String =
    """WITH tf AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'customer')) AS BIGINT) AS tf0,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'window')) AS BIGINT) AS tf1,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'query')) AS BIGINT) AS tf2
           FROM documents
         ), stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
           FROM tf
         ), scored AS (
           SELECT doc_id,
             floor((
               ln((CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                  / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + ln((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                  / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + ln((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                  / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             )*1e4 + 0.5)/1e4 AS score
           FROM tf, stats)
         SELECT rk, doc_id, score FROM (
           SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM scored WHERE score > 0)
         WHERE rk <= 10 ORDER BY rk"""


  /** t10 Spark-dialect replay — extracted for the same composition on
    * the spark.sql side (t20 entry in [[sparkSql]]). */
  private[graft] lazy val t10SparkSql: String =
    """WITH tf AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS dl,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'customer')) AS BIGINT) AS tf0,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'window')) AS BIGINT) AS tf1,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'query')) AS BIGINT) AS tf2
           FROM documents
         ), stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
           FROM tf
         ), scored AS (
           SELECT doc_id,
             floor((
               log((CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                  / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + log((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                  / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + log((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                  / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             )*1e4 + 0.5)/1e4 AS score
           FROM tf CROSS JOIN stats)
         SELECT rk, doc_id, score FROM (
           SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM scored WHERE score > 0)
         WHERE rk <= 10 ORDER BY rk"""


  /** t20 DuckDB replay: the keyword side is [[t10OracleSql]] verbatim
    * as a derived table; the vector side re-derives the s01-style
    * cosine ranking against the pinned query vector (vec_id 0); RRF
    * (c = 60) fuses the two top-10 lists through a full outer join.
    * Mirrors [[graft.operators.Similarity.rrfFusion]] constant-for-
    * constant. */
  private[graft] lazy val t20OracleSql: String =
    s"""WITH kw AS (
           SELECT doc_id, CAST(rk AS BIGINT) AS rk_kw FROM ($t10OracleSql)
         ), vq AS (
           SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0
         ), vscored AS (
           SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
               AS cos
           FROM embeddings e, vq q WHERE e.vec_id <> 0
         ), vrank AS (
           SELECT doc_id, rk_vec FROM (
             SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT)
                 AS rk_vec
             FROM vscored)
           WHERE rk_vec <= 10
         ), fused AS (
           SELECT coalesce(kw.doc_id, vrank.doc_id) AS doc_id,
             floor((coalesce(1.0/(60.0 + CAST(rk_kw AS DOUBLE)), 0.0)
                  + coalesce(1.0/(60.0 + CAST(rk_vec AS DOUBLE)), 0.0))*1e6
                  + 0.5)/1e6 AS rrf
           FROM kw FULL OUTER JOIN vrank ON kw.doc_id = vrank.doc_id)
         SELECT rk, doc_id, rrf FROM (
           SELECT doc_id, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM fused)
         WHERE rk <= 10 ORDER BY rk"""


  /** t20 Spark-dialect replay — same composition over [[t10SparkSql]]
    * and the graft_dot cosine (identical op order to the engine's
    * `dot(qv, v) / (q_nrm · nrm)`). */
  private[graft] lazy val t20SparkSql: String =
    s"""WITH kw AS (
           SELECT doc_id, CAST(rk AS BIGINT) AS rk_kw FROM ($t10SparkSql)
         ), ve AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), vn AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM ve
         ), vq AS (
           SELECT v AS qv, nrm AS q_nrm FROM vn WHERE vec_id = 0
         ), vscored AS (
           SELECT a.vec_id AS doc_id,
             round(graft_dot(q.qv, a.v) / (q.q_nrm * a.nrm), 6) AS cos
           FROM vn a CROSS JOIN vq q WHERE a.vec_id <> 0
         ), vrank AS (
           SELECT doc_id, rk_vec FROM (
             SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT)
                 AS rk_vec
             FROM vscored)
           WHERE rk_vec <= 10
         ), fused AS (
           SELECT coalesce(kw.doc_id, vrank.doc_id) AS doc_id,
             floor((coalesce(1.0/(60.0 + CAST(rk_kw AS DOUBLE)), 0.0)
                  + coalesce(1.0/(60.0 + CAST(rk_vec AS DOUBLE)), 0.0))*1e6
                  + 0.5)/1e6 AS rrf
           FROM kw FULL OUTER JOIN vrank ON kw.doc_id = vrank.doc_id)
         SELECT rk, doc_id, rrf FROM (
           SELECT doc_id, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM fused)
         WHERE rk <= 10 ORDER BY rk"""


  /** t32 replay — the t14 recursive-CTE BPE encode (merge table
    * generated from the SAME [[graft.operators.TextOps.pinnedMerges]]
    * fixture) with the per-language fertility tail. */
  /** t33 replay — DISTINCT per-doc trigram md5s (1-based list_slice,
    * space-joined — byte-identical to the engine's concat_ws), min
    * doc_id first-occurrence, LEFT join back so trigram-less docs
    * report the 1000 convention. All-integer. */
  private[graft] lazy val t33OracleSql: String =
    raw"""WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS fp
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                 FROM tk WHERE len(t) >= 3)
         ), fo AS (
           SELECT fp, min(doc_id) AS first_doc FROM tri GROUP BY fp
         ), pd AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
           FROM tri JOIN fo USING (fp) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0) = 0 THEN CAST(1000 AS BIGINT)
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""


  /** t34 replay — the d15 fixture split (floor on both sides), store
    * = distinct trigram fps below the cut, batch docs LEFT-join the
    * store per distinct trigram. All-integer. */
  private[graft] lazy val t34OracleSql: String = {
    val frac = graft.operators.TextOps.T34SplitFrac
    raw"""WITH cut AS (
           SELECT CAST(floor(max(doc_id) * $frac) AS BIGINT) AS c
           FROM documents
         ), tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS fp
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                 FROM tk WHERE len(t) >= 3)
         ), store AS (
           SELECT DISTINCT fp FROM tri, cut WHERE doc_id < c
         ), batch AS (
           SELECT doc_id FROM documents, cut WHERE doc_id >= c
         ), pd AS (
           SELECT tri.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(sum(CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
           FROM tri JOIN cut ON tri.doc_id >= cut.c
           LEFT JOIN store s ON s.fp = tri.fp
           GROUP BY tri.doc_id)
         SELECT b.doc_id,
           CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0) = 0 THEN CAST(1000 AS BIGINT)
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM batch b LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""
  }


  private[graft] lazy val t32OracleSql: String = {
    val merges = graft.operators.TextOps.pinnedMerges
    val rows = merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, ' $a $b ', ' $a$b ')"
    }.mkString(",\n             ")
    val k = merges.length + 1
    s"""WITH RECURSIVE
         words AS (
           SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents
         ), vocab AS (SELECT DISTINCT word FROM words
         ), merges(k, pat, rep) AS (
           SELECT * FROM (VALUES
             $rows)
         ), enc AS (
           SELECT word,
             ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s,
             1 AS k
           FROM vocab
           UNION ALL
           SELECT e.word,
             CASE WHEN strpos(e.s, m.pat) > 0
               THEN substr(e.s, 1, strpos(e.s, m.pat) - 1) || m.rep ||
                    substr(e.s, strpos(e.s, m.pat) + length(m.pat))
               ELSE e.s END,
             CASE WHEN strpos(e.s, m.pat) > 0 THEN e.k ELSE e.k + 1 END
           FROM enc e JOIN merges m ON m.k = e.k
         ), encoded AS (
           SELECT word,
             length(trim(s)) - length(replace(trim(s), ' ', '')) + 1 AS n_sub
           FROM enc WHERE k = $k
         ), agg AS (
           SELECT w.lang,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(e.n_sub) AS BIGINT) AS n_bpe_tokens
           FROM words w JOIN encoded e USING (word)
           GROUP BY w.lang)
         SELECT lang, n_words, n_bpe_tokens,
           CAST(floor(CAST(n_bpe_tokens AS DOUBLE) * 1000.0
             / CAST(n_words AS DOUBLE) + 0.5) AS BIGINT) AS fertility_milli
         FROM agg ORDER BY lang"""
  }


  /** t29 DuckDB replay — the pinned unigram model as a VALUES
    * literal (integer counts; scores re-derived with the engine's
    * exact ln((c+1)/denom) op order), [[viterbiSegSql]] in serve mode
    * (UNK coalesce on the single-char candidates, per-word piece
    * COUNTS out), joined back to the corpus token stream for per-doc
    * totals. Knobs single-sourced from [[graft.operators.TextOps]]. */
  private[graft] lazy val t29OracleSql: String = {
    val T = graft.operators.TextOps
    val unk = s"CAST(${T.T29UnkScore} AS DOUBLE)"
    val vals = T.pinnedUnigram
      .map { case (p, c) => s"('$p', $c)" }.mkString(", ")
    s"""WITH tok AS MATERIALIZED (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), words AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(length(w)) > 8
             THEN CAST(error('t29 unroll bound: word longer than 8') AS INT)
             ELSE 1 END AS ok FROM words
         ), scp AS MATERIALIZED (
           SELECT piece,
             ln(CAST(c + 1 AS DOUBLE) /
                CAST(${T.pinnedUnigramDenom} AS DOUBLE)) AS s
           FROM (VALUES $vals) AS t(piece, c)
         ), seg AS MATERIALIZED (
           ${viterbiSegSql("scp", Some(unk))}
         )
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_pieces
         FROM tok JOIN seg USING (w)
         WHERE (SELECT ok FROM guard) = 1
         GROUP BY doc_id
         ORDER BY doc_id"""
  }


  /** t29 Spark-dialect replay — the same pinned model as array
    * literals through the registered serve kernel
    * (`graft_unigram_segment_unk`); distinct-word kernel + join-back,
    * the engine's own shape. */
  private[graft] lazy val t29SparkSql: String = {
    val T = graft.operators.TextOps
    val pcs = T.pinnedUnigramPieces
      .map(p => s"'$p'").mkString("array(", ", ", ")")
    val cts = T.pinnedUnigram
      .map(_._2.toString + "L").mkString("array(", ", ", ")")
    s"""WITH w AS (
           SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word
           FROM documents
         ), v AS (
           SELECT word,
             CAST(size(graft_unigram_segment_unk(word, $pcs,
               transform($cts, c -> ln(CAST(c + 1 AS DOUBLE) /
                 CAST(${T.pinnedUnigramDenom}L AS DOUBLE))),
               CAST(${T.T29UnkScore} AS DOUBLE))) AS BIGINT) AS n_sub
           FROM (SELECT DISTINCT word FROM w)
         )
         SELECT w.doc_id, count(1) AS n_words, sum(v.n_sub) AS n_pieces
         FROM w JOIN v USING (word)
         GROUP BY w.doc_id ORDER BY doc_id"""
  }


  /** t28 Spark-dialect replay — same statement shape as the DuckDB
    * form; the rank-ordered float sums go through the engine's own
    * array-fold spelling (array_sort + aggregate, the t12 pattern). */
  private[graft] lazy val t28SparkSql: String = {
    val K = graft.operators.TextOps.T28K
    val kf = "CAST(kf AS DOUBLE)"
    val num = s"($kf*sxy - sx*sy)"
    val den = s"($kf*sxx - sx*sx)"
    val deny = s"($kf*syy - sy*sy)"
    def sumOf(body: String) =
      s"""aggregate(transform(arr, e -> $body),
               CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""
    s"""WITH w AS (
           SELECT explode(split(trim(text), '\\\\s+')) AS w FROM documents
         ), cnt AS (
           SELECT w, count(1) AS n FROM w GROUP BY w
         ), tot AS (
           SELECT count(1) AS nv, sum(n) AS nt FROM cnt
         ), top AS (
           SELECT rk, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
           FROM (SELECT n,
                   row_number() OVER (ORDER BY n DESC, w ASC) AS rk
                 FROM cnt)
           WHERE rk <= $K
         ), packed AS (
           SELECT count(1) AS kf,
             array_sort(collect_list(struct(rk, x, y))) AS arr
           FROM top
         ), s AS (
           SELECT kf,
             ${sumOf("e.x")} AS sx, ${sumOf("e.y")} AS sy,
             ${sumOf("e.x * e.y")} AS sxy, ${sumOf("e.x * e.x")} AS sxx,
             ${sumOf("e.y * e.y")} AS syy
           FROM packed)
         SELECT nv AS n_vocab, nt AS n_tokens, kf AS k_fit,
           floor(($num/$den)*1e4 + 0.5)/1e4 AS slope,
           floor(((sy - ($num/$den)*sx)/$kf)*1e4 + 0.5)/1e4 AS intercept,
           floor((($num*$num)/($den*$deny))*1e4 + 0.5)/1e4 AS r2
         FROM tot CROSS JOIN s"""
  }


  /** t28 DuckDB replay — token counts, a (n DESC, w ASC) rank, and
    * the least-squares fit over the top-[[graft.operators.TextOps.T28K]]
    * ranks with every float sum rank-ORDERED (DuckDB's ordered
    * aggregate folds sequentially — the t12 discipline — so the sums
    * reproduce the engine's array-fold bit-for-bit). */
  private[graft] lazy val t28OracleSql: String = {
    val K = graft.operators.TextOps.T28K
    val kf = "CAST(kf AS DOUBLE)"
    val num = s"($kf*sxy - sx*sy)"
    val den = s"($kf*sxx - sx*sx)"
    val deny = s"($kf*syy - sy*sy)"
    s"""WITH w AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), cnt AS (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY w
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS nv,
                  CAST(sum(n) AS BIGINT) AS nt FROM cnt
         ), top AS (
           SELECT rk, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
           FROM (SELECT n,
                   row_number() OVER (ORDER BY n DESC, w ASC) AS rk
                 FROM cnt)
           WHERE rk <= $K
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS kf,
             sum(x ORDER BY rk) AS sx, sum(y ORDER BY rk) AS sy,
             sum(x*y ORDER BY rk) AS sxy, sum(x*x ORDER BY rk) AS sxx,
             sum(y*y ORDER BY rk) AS syy
           FROM top)
         SELECT nv AS n_vocab, nt AS n_tokens, kf AS k_fit,
           floor(($num/$den)*1e4 + 0.5)/1e4 AS slope,
           floor(((sy - ($num/$den)*sx)/$kf)*1e4 + 0.5)/1e4 AS intercept,
           floor((($num*$num)/($den*$deny))*1e4 + 0.5)/1e4 AS r2
         FROM tot CROSS JOIN s"""
  }


  /** t27 DuckDB replay — the full 2-round hard-EM trajectory
    * re-derived from the raw corpus: weighted-substring seed vocab,
    * seed scores, [[t27SegSql]]'s unrolled Viterbi per round, add-1
    * re-scoring between rounds (the engine's exact double op order:
    * ln of a division of two exact integers), final top-K by
    * (uses DESC, piece ASC). Knobs interpolated from
    * [[graft.operators.TextOps]]; a guard CTE errors if any corpus
    * word exceeds the W=8 unroll bound instead of silently truncating
    * (the capGuard discipline). */
  private[graft] lazy val t27OracleSql: String = {
    val T = graft.operators.TextOps
    val P = T.T27MaxPieceLen
    val S = T.T27SeedMulti
    val K = T.T27K
    require(T.T27Rounds == 2, "t27 oracle unrolls exactly 2 rounds")
    require(P == 4, "the pick CASE is written for maxPieceLen 4")
    s"""WITH words AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
             FROM documents)
           GROUP BY w
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(length(w)) > 8
             THEN CAST(error('t27 unroll bound: word longer than 8') AS INT)
             ELSE 1 END AS ok FROM words
         ), occ AS (
           SELECT substr(w.w, CAST(i.i AS INT), CAST(l.l AS INT)) AS piece, w.n
           FROM words w
           CROSS JOIN (SELECT unnest(range(1, 9)) AS i) i
           CROSS JOIN (SELECT unnest(range(1, ${P + 1})) AS l) l
           WHERE i.i + l.l - 1 <= length(w.w)
         ), f0 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS f FROM occ GROUP BY piece
         ), vocab0 AS MATERIALIZED (
           SELECT piece, f FROM f0 WHERE length(piece) = 1
           UNION ALL
           SELECT piece, f FROM (
             SELECT piece, f,
               row_number() OVER (ORDER BY f DESC, piece ASC) AS rk
             FROM f0 WHERE length(piece) > 1) WHERE rk <= $S
         ), tot0 AS MATERIALIZED (
           SELECT CAST(sum(f) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           FROM vocab0
         ), sc0 AS MATERIALIZED (
           SELECT piece,
             ln(CAST(f AS DOUBLE) / CAST((SELECT t FROM tot0) AS DOUBLE)) AS s
           FROM vocab0
         ), seg1 AS MATERIALIZED (
           ${t27SegSql("sc0")}
         ), c1 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM seg1 GROUP BY piece
         ), totc1 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1
         ), sc1 AS MATERIALIZED (
           SELECT v.piece,
             ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) /
                CAST((SELECT t FROM totc1) + (SELECT v FROM tot0) AS DOUBLE))
               AS s
           FROM vocab0 v LEFT JOIN c1 c USING (piece)
         ), seg2 AS MATERIALIZED (
           ${t27SegSql("sc1")}
         ), c2 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM seg2 GROUP BY piece
         ), totc2 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM c2)
         SELECT rk, piece, n_uses, logp FROM (
           SELECT piece, c AS n_uses,
             floor(ln(CAST(c + 1 AS DOUBLE) /
               CAST((SELECT t FROM totc2) + (SELECT v FROM tot0) AS DOUBLE))
               *1e4 + 0.5)/1e4 AS logp,
             row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
           FROM c2)
         WHERE rk <= $K AND (SELECT ok FROM guard) = 1
         ORDER BY rk"""
  }


  private[graft] lazy val t26OracleSql: String = {
    val w = graft.operators.TextOps.T26Width
    s"""$t26MarkedCtes, isl AS (
           SELECT doc_id,
             greatest(0, e - greatest(i - 1,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)))
               AS contrib
           FROM marked
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(contrib) AS BIGINT) AS covered_tokens
           FROM isl GROUP BY doc_id
         )
         SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
           CAST(greatest(b.n_tokens - ${w - 1}, 0) AS INT) AS n_windows,
           coalesce(a.n_dup_windows, 0) AS n_dup_windows,
           coalesce(a.covered_tokens, 0) AS covered_tokens,
           floor((CAST(coalesce(a.covered_tokens, 0) AS DOUBLE)
                  / CAST(b.n_tokens AS DOUBLE))*1e4 + 0.5)/1e4 AS dup_frac
         FROM base b LEFT JOIN agg a USING (doc_id)
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY b.doc_id"""
  }


  /** t30 replay — the t18 bigram-extraction dialect with the three
    * KN count frames; the discount interpolates from
    * [[graft.operators.TextOps.T30Discount]] so engine and oracle can
    * never discount at different rates. */
  private[graft] lazy val t30OracleSql: String = {
    val d = graft.operators.TextOps.T30Discount
    s"""WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT tk[i] AS w1, tk[i + 1] AS w2
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), bgc AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
           FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT w1, CAST(sum(n12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS fwd
           FROM bgc GROUP BY 1
         ), cont AS (
           SELECT w2, CAST(count(*) AS BIGINT) AS back FROM bgc GROUP BY 1
         ), tot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bgc
         ), scored AS (
           SELECT b.w1, b.w2, b.n12,
             floor((greatest(CAST(b.n12 AS DOUBLE) - $d, 0.0)
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


  /** t31 replay — the t26 window-fingerprint CTEs (wins = exact
    * engine fingerprints, BMP guard included) split by the x01 hash
    * rule on the doc id; train fingerprints DISTINCT, eval windows
    * LEFT-JOIN them, milli ratio on exact integer counts. */
  private[graft] lazy val t31OracleSql: String =
    s"""$t26MarkedCtes, spl AS (
           SELECT doc_id,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
                  THEN 'test'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                  THEN 'val' ELSE 'train' END AS split
           FROM documents
         ), trainfp AS (
           SELECT DISTINCT fp FROM wins JOIN spl USING (doc_id)
           WHERE split = 'train'
         ), ev AS (
           SELECT we.doc_id, we.fp FROM wins we JOIN spl USING (doc_id)
           WHERE split = 'test'
         ), rep AS (
           SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN tf.fp IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_memorized
           FROM ev e LEFT JOIN trainfp tf ON e.fp = tf.fp
           GROUP BY e.doc_id)
         SELECT doc_id, n_windows, n_memorized,
           CAST(floor(CAST(n_memorized AS DOUBLE) * 1000.0
             / CAST(n_windows AS DOUBLE) + 0.5) AS BIGINT)
             AS memorized_milli
         FROM rep
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY doc_id"""


  /** t25 DuckDB replay — the CMS cell counts ARE per-(row, cell)
    * token-instance counts (the sketch is linear), so the oracle
    * recomputes them as a plain GROUP BY over the FNV token hashes
    * (d04's HUGEINT mod-2⁶⁴ replay) pushed through the multiply-shift
    * cell map (split-form 128-bit-safe multiply, then the unsigned
    * `// 2^(64-logW)` that mirrors the JVM's `>>>`). Depth, width and
    * the row multipliers are interpolated from
    * [[graft.functions.Hashing]] — the engine can never sketch at a
    * geometry the oracle doesn't recount. */
  private[graft] lazy val t25OracleSql: String = {
    val H = graft.functions.Hashing
    val shiftDiv = java.math.BigInteger.ONE.shiftLeft(64 - H.CmsLogW)
    val multRows = H.CmsMultipliers.zipWithIndex
      .map { case (a, r) => s"($r, ${java.lang.Long.toUnsignedString(a)}::HUGEINT)" }
      .mkString(", ")
    s"""WITH words AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(ord(c)) > 65535
             THEN CAST(error('t25 BMP bound: non-BMP code point desyncs the fnv64 replay (UTF-16 units vs code points)') AS INT)
             ELSE 1 END AS ok
           FROM (SELECT unnest(string_split(w, '')) AS c FROM words)
         ), counts AS (SELECT w, count(*) AS n FROM words GROUP BY 1
         ), th AS (
           SELECT w, CAST(n AS BIGINT) AS n, list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(w, ''), c -> ord(c)::HUGEINT)),
               (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                         % 18446744073709551616::HUGEINT) AS h
           FROM counts
         ), m(r, a) AS (VALUES $multRows
         ), cells AS (
           SELECT th.w, th.n, m.r,
             CAST((((th.h % 4294967296) * m.a
                 + (((th.h // 4294967296) * m.a) % 4294967296) * 4294967296)
                % 18446744073709551616::HUGEINT) // $shiftDiv AS INT) AS cell
           FROM th CROSS JOIN m
         ), cellcounts AS (
           SELECT r, cell, CAST(sum(n) AS BIGINT) AS cn
           FROM cells GROUP BY 1, 2
         ), topk AS (
           SELECT w, n, rk FROM (
             SELECT w, n, row_number() OVER (ORDER BY n DESC, w ASC) AS rk
             FROM th) WHERE rk <= 10
         )
         SELECT rk, w, n_exact, n_cms FROM (
           SELECT t.rk, t.w, t.n AS n_exact, min(cc.cn) AS n_cms
           FROM topk t
           JOIN cells c ON c.w = t.w
           JOIN cellcounts cc ON cc.r = c.r AND cc.cell = c.cell
           GROUP BY t.rk, t.w, t.n)
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY rk"""
  }


  /** t13: the 8-round BPE training loop unrolled — round r counts
    * weighted adjacent symbol pairs over the vocabulary AS ENCODED BY
    * merges 1..r−1 (each applied by a recursive replace-first CTE, the
    * t14 equivalence), takes the (count DESC, a, b) argmax as merge r,
    * and feeds the re-encoded vocabulary forward. The merge scalars
    * flow between rounds as 1-row CTE cross joins, so the oracle
    * re-derives the training trajectory from the raw corpus — the one
    * iterative-stateful query in the suite, expressed as SQL by
    * unrolling its fixed iteration count. */
  private[graft] lazy val t13OracleSql: String = {
    val rounds = (1 to 8).map { r =>
      val prev = s"enc${r - 1}"
      s"""cnt$r AS (
           SELECT sy[i] AS a, sy[i+1] AS b, CAST(sum(freq) AS BIGINT) AS n FROM (
             SELECT freq, sy, unnest(range(1, len(sy))) AS i FROM (
               SELECT freq, string_split(trim(s), ' ') AS sy FROM $prev))
           GROUP BY 1, 2),
         m$r AS (SELECT a, b, n FROM cnt$r ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         enc${r}r(word, freq, s) AS (
           SELECT word, freq, s FROM $prev
           UNION ALL
           SELECT e.word, e.freq,
             substr(e.s, 1, strpos(e.s, ' '||m.a||' '||m.b||' ') - 1) ||
             ' '||m.a||m.b||' ' ||
             substr(e.s, strpos(e.s, ' '||m.a||' '||m.b||' ') + length(' '||m.a||' '||m.b||' '))
           FROM enc${r}r e, m$r m
           WHERE strpos(e.s, ' '||m.a||' '||m.b||' ') > 0),
         enc$r AS (SELECT e.word, e.freq, e.s FROM enc${r}r e, m$r m
           WHERE strpos(e.s, ' '||m.a||' '||m.b||' ') = 0)"""
    }.mkString(",\n         ")
    val out = (1 to 8).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS rank, a AS "left", b AS "right",
              a || b AS merged, n FROM m$r""")
      .mkString("\n         UNION ALL ")
    s"""WITH RECURSIVE
         words AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                   FROM documents),
         vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY word),
         enc0 AS (SELECT word, freq,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s
           FROM vocab),
         $rounds
         SELECT * FROM ($out) ORDER BY rank"""
  }


  private[graft] val oracles: Map[String, String] = Map(
    "t01_token_counts" ->
      """SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
         length(text) AS n_text_chars
         FROM documents ORDER BY doc_id""",
    "t02_quality_score" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nonspace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars
           FROM documents)
         SELECT doc_id,
           floor((n_stop / n_tok)*1e4 + 0.5)/1e4 AS stop_ratio,
           floor((n_nonspace / n_tok)*1e4 + 0.5)/1e4 AS mean_tok_len,
           floor((n_alpha / n_chars)*1e4 + 0.5)/1e4 AS alpha_ratio,
           floor((least(1.0, n_tok/20.0)*0.4
                 + least(1.0, (n_stop/n_tok)*5.0)*0.3
                 + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
         FROM f ORDER BY doc_id""",
    "t03_lang_id" ->
      """WITH f AS (
           SELECT lang,
             CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                  / len(regexp_split_to_array(trim(text), '\s+')) >= 0.05
                  THEN 'en' ELSE 'unk' END AS lang_pred
           FROM documents)
         SELECT lang, lang_pred, count(*) AS n FROM f
         GROUP BY 1,2 ORDER BY 1,2""",
    "t04_fingerprint" ->
      """SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "t05_top_bigrams" ->
      """WITH toks AS (
           SELECT lang, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT lang, unnest([array_to_string(tk[i:i+1], ' ')
             for i in range(1, len(tk))]) AS bigram
           FROM toks WHERE len(tk) >= 2
         ), counts AS (
           SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
         SELECT lang, rk, bigram, n FROM (
           SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram ASC) AS rk
           FROM counts)
         WHERE rk <= 5 ORDER BY lang, rk""",
    "t06_repetition" ->
      """WITH ex AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents
         ), cnt AS (
           SELECT doc_id, tok, count(*) AS n FROM ex GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           floor((1.0 - count(*) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS dup_ratio,
           floor((max(n) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS top_tok_frac
         FROM cnt GROUP BY doc_id ORDER BY doc_id""",
    "t07_pii_scrub" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{7,}|\b(?i:customer|supplier)\b'))
           AS INT) AS n_redacted,
         length(text) AS n_chars_before,
         length(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{7,}|\b(?i:customer|supplier)\b',
           '[REDACTED]', 'g')) AS n_chars_after
         FROM documents ORDER BY doc_id""",
    "t08_gopher_rules" ->
      """WITH f AS (
           SELECT lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nospace,
             CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(len(text) AS DOUBLE) AS n_chars,
             len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
           FROM documents
         ), g AS (
           SELECT lang,
             NOT (n_tok BETWEEN 30.0 AND 50000.0) AS fail_len,
             NOT (n_nospace / n_tok BETWEEN 2.0 AND 10.0) AS fail_tok,
             n_stop < 2 AS fail_stop,
             n_alpha / n_chars < 0.6 AS fail_alpha
           FROM f)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN fail_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_len,
           CAST(sum(CASE WHEN fail_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_tok,
           CAST(sum(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
           CAST(sum(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
           CAST(sum(CASE WHEN NOT fail_len AND NOT fail_tok AND NOT fail_stop
                         AND NOT fail_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         FROM g GROUP BY lang ORDER BY lang""",
    "t09_chunk_windows" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 23) / 24.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta)
         SELECT doc_id, i AS chunk_id,
           CAST(len(tk[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(tk[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)], ' ')
             AS chunk_text
         FROM ex ORDER BY doc_id, chunk_id""",
    "t10_bm25" -> t10OracleSql,
    "t20_rrf_fusion" -> t20OracleSql,
    "t21_lm_continuations" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i] AS context, tk[i + 1] AS next_tok
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), pc AS (
           SELECT context, next_tok, count(*) AS n_pair FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT context, CAST(sum(n_pair) AS BIGINT) AS ctx_total
           FROM pc GROUP BY 1
         ), top_ctx AS (
           SELECT context, ctx_total FROM (
             SELECT context, ctx_total,
               row_number() OVER (ORDER BY ctx_total DESC, context ASC) AS cr
             FROM ctx) WHERE cr <= 20)
         SELECT context, CAST(rk AS BIGINT) AS rk, next_tok, n_pair,
           floor((CAST(n_pair AS DOUBLE) / CAST(ctx_total AS DOUBLE))*1e4
             + 0.5)/1e4 AS prob
         FROM (
           SELECT p.context, p.next_tok, p.n_pair, t.ctx_total,
             row_number() OVER (PARTITION BY p.context
               ORDER BY p.n_pair DESC, p.next_tok ASC) AS rk
           FROM pc p JOIN top_ctx t USING (context))
         WHERE rk <= 3 ORDER BY context, rk""",
    "t25_cms_counts" -> t25OracleSql,
    "t26_span_coverage" -> t26OracleSql,
    "t27_unigram_lm" -> t27OracleSql,
    "t28_zipf_profile" -> t28OracleSql,
    "t29_unigram_encode" -> t29OracleSql,
    "t11_heavy_hitters" ->
      """WITH w AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           FROM documents
         ), c AS (SELECT w, count(*) AS n FROM w GROUP BY 1)
         SELECT rk, w, n FROM (
           SELECT w, CAST(n AS BIGINT) AS n,
             row_number() OVER (ORDER BY n DESC, w) AS rk
           FROM c)
         WHERE rk <= 10 ORDER BY rk""",
    "t12_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT doc_id, i - 1 AS pos, tk[CAST(i AS INT)] AS v,
             tk[CAST(i + 1 AS INT)] AS w
           FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), cvw AS (SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
         ), cv AS (SELECT v, count(*) AS cv FROM bg GROUP BY 1
         ), vocab AS (
           SELECT count(DISTINCT tk2) AS vsz
           FROM (SELECT unnest(tk) AS tk2 FROM toks)
         ), scored AS (
           SELECT bg.doc_id, bg.pos,
             ln((CAST(cvw AS DOUBLE) + 1.0)
                / (CAST(cv AS DOUBLE) + CAST(vsz AS DOUBLE))) AS lnp
           FROM bg JOIN cvw USING (v, w) JOIN cv USING (v) CROSS JOIN vocab)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(((-sum(lnp ORDER BY pos)) / CAST(count(*) AS DOUBLE))*1e4
             + 0.5)/1e4 AS cross_entropy,
           floor(exp((-sum(lnp ORDER BY pos)) / CAST(count(*) AS DOUBLE))*1e4
             + 0.5)/1e4 AS ppl
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // t14: the pinned-merge BPE encode replayed exactly — symbols as a
    // space-separated sentinel string, one recursive step = replace the
    // LEFTMOST occurrence of merge k's pair (equivalent to the
    // non-overlapping left-to-right scan: a merge never creates a new
    // occurrence of its own pair to its left), k advances when merge k
    // no longer applies. n_sub = symbol count of the fixpoint string.,
    "t14_bpe_encode" ->
      """WITH RECURSIVE
         words AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
           FROM documents
         ), vocab AS (SELECT DISTINCT word FROM words
         ), merges(k, pat, rep) AS (
           SELECT * FROM (VALUES
             (1, ' e r ',     ' er '),
             (2, ' e </w> ',  ' e</w> '),
             (3, ' n </w> ',  ' n</w> '),
             (4, ' er </w> ', ' er</w> '),
             (5, ' o w ',     ' ow '),
             (6, ' ow </w> ', ' ow</w> '),
             (7, ' o r ',     ' or '),
             (8, ' s t ',     ' st '))
         ), enc AS (
           SELECT word,
             ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s,
             1 AS k
           FROM vocab
           UNION ALL
           SELECT e.word,
             CASE WHEN strpos(e.s, m.pat) > 0
               THEN substr(e.s, 1, strpos(e.s, m.pat) - 1) || m.rep ||
                    substr(e.s, strpos(e.s, m.pat) + length(m.pat))
               ELSE e.s END,
             CASE WHEN strpos(e.s, m.pat) > 0 THEN e.k ELSE e.k + 1 END
           FROM enc e JOIN merges m ON m.k = e.k
         ), encoded AS (
           SELECT word,
             length(trim(s)) - length(replace(trim(s), ' ', '')) + 1 AS n_sub
           FROM enc WHERE k = 9
         )
         SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n_sub) AS BIGINT) AS n_bpe_tokens
         FROM words w JOIN encoded e USING (word)
         GROUP BY w.doc_id
         ORDER BY doc_id""",
    "t32_bpe_fertility" -> t32OracleSql,
    "t33_ngram_novelty" -> t33OracleSql,
    "t34_incremental_novelty" -> t34OracleSql,
    "t31_memorization" -> t31OracleSql,
    "t30_kneser_ney" -> t30OracleSql,
    "t22_blocklist_filter" ->
      s"""WITH f AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> x IN ($t22TermsSql))) AS BIGINT) AS n_flagged
           FROM documents)
         SELECT doc_id, n_tokens, n_flagged,
           floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             AS flagged_frac,
           (floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             < ${TextOps.BlocklistMaxFrac})
             AS keep
         FROM f ORDER BY doc_id""",
    // t23: corpus-frequency boilerplate scrub — chunks occurring >= 2
    // times anywhere lose ALL copies; clean_text re-joins survivors in
    // chunk order (empty docs coalesce to '').,
    "t23_boilerplate_scrub" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           coalesce(array_to_string(
             list(chunk_text ORDER BY chunk_id ASC) FILTER (WHERE keep), ' '),
             '') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    // t24: combined store+batch counts == whole-corpus counts, so the
    // oracle is t23's replay with verdicts restricted to the batch
    // (doc_id >= T24SplitAt) — the union-equivalence law in SQL form.,
    "t24_incremental_boilerplate" ->
      s"""WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text
           WHERE c.doc_id >= ${graft.operators.TextOps.T24SplitAt})
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           coalesce(array_to_string(
             list(chunk_text ORDER BY chunk_id ASC) FILTER (WHERE keep), ' '),
             '') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t15_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), rk AS (
           SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_text
               ORDER BY doc_id ASC, chunk_id ASC) AS rn
           FROM ck)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
           floor((count(CASE WHEN rn = 1 THEN 1 END)
             / CAST(count(*) AS DOUBLE))*1e4 + 0.5)/1e4 AS kept_frac
         FROM rk GROUP BY doc_id ORDER BY doc_id""",
    "t16_inverted_index" ->
      """WITH ex AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents
         ), tf AS (
           SELECT term, doc_id, count(*) AS tf FROM ex GROUP BY 1, 2)
         SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           array_to_string(
             (list(doc_id || ':' || tf ORDER BY doc_id))[1:10], ',')
             AS postings
         FROM tf GROUP BY term ORDER BY term""",
    "t17_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), tok AS (
           SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS term
           FROM toks, LATERAL (SELECT unnest(range(1, len(tk)+1)) AS i)
         ), bg AS (
           SELECT t1.term || ' ' || t2.term AS phrase, count(*) AS n
           FROM tok t1 JOIN tok t2
             ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
           GROUP BY 1
         ), ph AS (
           SELECT phrase, string_split(phrase, ' ')[1] AS w1,
             string_split(phrase, ' ')[2] AS w2
           FROM (SELECT phrase FROM bg ORDER BY n DESC, phrase ASC LIMIT 3)
         ), p1 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w1
         ), p2 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w2)
         SELECT p1.phrase, p1.doc_id, count(*) AS n_hits,
           min(p1.pos) AS first_pos
         FROM p1 JOIN p2 ON p1.phrase = p2.phrase
           AND p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t18_collocations" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i] || ' ' || tk[i + 1] AS bigram
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), bgc AS (SELECT bigram, count(*) AS n_pair FROM bg GROUP BY 1
         ), uni AS (
           SELECT w, count(*) AS n_w
           FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1
         ), tot AS (
           SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM bgc) AS b_total,
             (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS t_total
         ), scored AS (
           SELECT b.bigram, b.n_pair,
             floor(ln((CAST(b.n_pair AS DOUBLE) / t.b_total)
               / ((CAST(u1.n_w AS DOUBLE) / t.t_total)
                  * (CAST(u2.n_w AS DOUBLE) / t.t_total)))*1e4 + 0.5)/1e4
               AS pmi
           FROM bgc b
           JOIN uni u1 ON u1.w = string_split(b.bigram, ' ')[1]
           JOIN uni u2 ON u2.w = string_split(b.bigram, ' ')[2]
           CROSS JOIN tot t
           WHERE b.n_pair >= 5)
         SELECT CAST(row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS INT)
             AS rk, bigram, n_pair, pmi
         FROM scored ORDER BY pmi DESC, bigram ASC LIMIT 20""",
    "t19_tfidf" ->
      """WITH tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY 1, 2
         ), dfc AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), nd AS (SELECT count(*) AS n_docs FROM documents
         ), scored AS (
           SELECT doc_id, tfc.term AS term,
             floor((CAST(tf AS DOUBLE)
               * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                      / (CAST(df AS DOUBLE) + 1.0)) + 1.0))*1e4 + 0.5)/1e4
               AS tfidf
           FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN nd)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf FROM (
           SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    "t13_bpe_merges" -> t13OracleSql,
    // s12 projects with the PINNED rotation fixture (Pca.pinnedModel,
    // signs canonicalized), so each pc is a pure centered dot the SQL
    // replays as an unrolled LEFT-ASSOCIATIVE sum — the same sequential
    // float-op order as the codegen'd loop, hence bit-identical before
    // the 4-decimal rounding.
  )

  private[graft] val spark: Map[String, String] = Map(
    "t01_token_counts" ->
      """SELECT doc_id,
           size(split(trim(text), '\\s+')) AS n_tokens,
           size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS n_subwords,
           length(text) AS n_text_chars
         FROM documents ORDER BY doc_id""",
    "t02_quality_score" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE) AS n_nonspace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars
           FROM documents)
         SELECT doc_id,
           floor((n_stop / n_tok)*1e4 + 0.5)/1e4 AS stop_ratio,
           floor((n_nonspace / n_tok)*1e4 + 0.5)/1e4 AS mean_tok_len,
           floor((n_alpha / n_chars)*1e4 + 0.5)/1e4 AS alpha_ratio,
           floor((least(1.0, n_tok/20.0)*0.4
                 + least(1.0, (n_stop/n_tok)*5.0)*0.3
                 + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
         FROM f ORDER BY doc_id""",
    "t03_lang_id" ->
      """WITH f AS (
           SELECT lang,
             CASE WHEN CAST(size(filter(split(trim(text), '\\s+'),
                    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                  / size(split(trim(text), '\\s+')) >= 0.05
                  THEN 'en' ELSE 'unk' END AS lang_pred
           FROM documents)
         SELECT lang, lang_pred, count(*) AS n FROM f
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t04_fingerprint" ->
      """SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
         FROM documents ORDER BY doc_id""",
    "t05_top_bigrams" ->
      """WITH toks AS (
           SELECT lang, split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT lang, explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS bigram
           FROM toks WHERE size(tk) >= 2
         ), counts AS (
           SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
         SELECT lang, rk, bigram, n FROM (
           SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram ASC) AS rk
           FROM counts)
         WHERE rk <= 5 ORDER BY lang, rk""",
    "t06_repetition" ->
      """WITH ex AS (
           SELECT doc_id, explode(split(trim(text), '\\s+')) AS tok
           FROM documents
         ), cnt AS (
           SELECT doc_id, tok, count(*) AS n FROM ex GROUP BY 1, 2)
         SELECT doc_id,
           sum(n) AS n_tokens,
           count(*) AS n_distinct,
           floor((1.0 - count(*) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS dup_ratio,
           floor((max(n) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS top_tok_frac
         FROM cnt GROUP BY doc_id ORDER BY doc_id""",
    "t07_pii_scrub" ->
      """SELECT doc_id,
           size(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{7,}|\\b(?i:customer|supplier)\\b',
             0)) AS n_redacted,
           length(text) AS n_chars_before,
           length(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{7,}|\\b(?i:customer|supplier)\\b',
             '[REDACTED]')) AS n_chars_after
         FROM documents ORDER BY doc_id""",
    "t08_gopher_rules" ->
      """WITH f AS (
           SELECT lang,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE) AS n_nospace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars,
             size(filter(split(trim(text), '\\s+'),
               w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
           FROM documents
         ), g AS (
           SELECT lang,
             NOT (n_tok BETWEEN 30.0 AND 50000.0) AS fail_len,
             NOT (n_nospace / n_tok BETWEEN 2.0 AND 10.0) AS fail_tok,
             n_stop < 2 AS fail_stop,
             n_alpha / n_chars < 0.6 AS fail_alpha
           FROM f)
         SELECT lang, count(*) AS n_docs,
           sum(CASE WHEN fail_len THEN 1 ELSE 0 END) AS n_fail_len,
           sum(CASE WHEN fail_tok THEN 1 ELSE 0 END) AS n_fail_tok,
           sum(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS n_fail_stop,
           sum(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS n_fail_alpha,
           sum(CASE WHEN NOT fail_len AND NOT fail_tok AND NOT fail_stop
                    AND NOT fail_alpha THEN 1 ELSE 0 END) AS n_pass
         FROM g GROUP BY lang ORDER BY lang""",
    "t09_chunk_windows" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 23) / 24.0) AS INT) AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(size(slice(tk, i*24 + 1, 32)) AS BIGINT) AS n_chunk_tokens,
           array_join(slice(tk, i*24 + 1, 32), ' ') AS chunk_text
         FROM ex ORDER BY doc_id, chunk_id""",
    "t22_blocklist_filter" ->
      s"""WITH f AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens,
             CAST(size(filter(split(trim(text), '\\\\s+'),
                 x -> x IN ($t22TermsSql))) AS BIGINT) AS n_flagged
           FROM documents)
         SELECT doc_id, n_tokens, n_flagged,
           floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             AS flagged_frac,
           (floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             < ${TextOps.BlocklistMaxFrac})
             AS keep
         FROM f ORDER BY doc_id""",
    "t24_incremental_boilerplate" ->
      s"""WITH toks AS (
           SELECT doc_id, split(trim(text), '\\\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text
           WHERE c.doc_id >= ${graft.operators.TextOps.T24SplitAt})
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           array_join(
             transform(
               array_sort(collect_list(
                 CASE WHEN keep THEN struct(chunk_id, chunk_text) END)),
               c -> c.chunk_text),
             ' ') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t23_boilerplate_scrub" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           array_join(
             transform(
               array_sort(collect_list(
                 CASE WHEN keep THEN struct(chunk_id, chunk_text) END)),
               c -> c.chunk_text),
             ' ') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t15_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), rk AS (
           SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_text
               ORDER BY doc_id ASC, chunk_id ASC) AS rn
           FROM ck)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
           floor((count(CASE WHEN rn = 1 THEN 1 END)
             / CAST(count(*) AS DOUBLE))*1e4 + 0.5)/1e4 AS kept_frac
         FROM rk GROUP BY doc_id ORDER BY doc_id""",
    "t16_inverted_index" ->
      """WITH ex AS (
           SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
           FROM documents
         ), tf AS (
           SELECT term, doc_id, count(*) AS tf FROM ex GROUP BY 1, 2)
         SELECT term, count(*) AS df, sum(tf) AS cf,
           array_join(
             transform(
               slice(array_sort(collect_list(struct(doc_id, tf))), 1, 10),
               e -> concat_ws(':', e.doc_id, e.tf)),
             ',') AS postings
         FROM tf GROUP BY term ORDER BY term""",
    "t17_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), tok AS (
           SELECT doc_id, CAST(pos0 + 1 AS BIGINT) AS pos, term
           FROM toks LATERAL VIEW posexplode(tk) x AS pos0, term
         ), bg AS (
           SELECT explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS phrase
           FROM toks WHERE size(tk) >= 2
         ), cnt AS (SELECT phrase, count(*) AS n FROM bg GROUP BY phrase),
         ph AS (
           SELECT phrase, split(phrase, ' ')[0] AS w1, split(phrase, ' ')[1] AS w2
           FROM (SELECT phrase FROM cnt ORDER BY n DESC, phrase ASC LIMIT 3)
         ), p1 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w1
         ), p2 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w2)
         SELECT p1.phrase, p1.doc_id, count(*) AS n_hits,
           min(p1.pos) AS first_pos
         FROM p1 JOIN p2 ON p1.phrase = p2.phrase
           AND p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t18_collocations" ->
      """WITH toks AS (
           SELECT split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS bigram
           FROM toks WHERE size(tk) >= 2
         ), bgc AS (SELECT bigram, count(*) AS n_pair FROM bg GROUP BY 1
         ), uni AS (
           SELECT w, count(*) AS n_w
           FROM (SELECT explode(tk) AS w FROM toks) GROUP BY 1
         ), tot AS (
           SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM bgc) AS b_total,
             (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS t_total
         ), scored AS (
           SELECT b.bigram, b.n_pair,
             floor(ln((CAST(b.n_pair AS DOUBLE) / t.b_total)
               / ((CAST(u1.n_w AS DOUBLE) / t.t_total)
                  * (CAST(u2.n_w AS DOUBLE) / t.t_total)))*1e4 + 0.5)/1e4
               AS pmi
           FROM bgc b
           JOIN uni u1 ON u1.w = split(b.bigram, ' ')[0]
           JOIN uni u2 ON u2.w = split(b.bigram, ' ')[1]
           CROSS JOIN tot t
           WHERE b.n_pair >= 5)
         SELECT rk, bigram, n_pair, pmi FROM (
           SELECT bigram, n_pair, pmi,
             row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS rk
           FROM scored)
         WHERE rk <= 20 ORDER BY rk""",
    "t19_tfidf" ->
      """WITH tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
                 FROM documents)
           GROUP BY 1, 2
         ), dfc AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), nd AS (SELECT count(*) AS n_docs FROM documents
         ), scored AS (
           SELECT doc_id, tfc.term AS term,
             floor((CAST(tf AS DOUBLE)
               * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                      / (CAST(df AS DOUBLE) + 1.0)) + 1.0))*1e4 + 0.5)/1e4
               AS tfidf
           FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN nd)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf FROM (
           SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    "t10_bm25" -> t10SparkSql,
    "t20_rrf_fusion" -> t20SparkSql,
    "t21_lm_continuations" ->
      """WITH toks AS (
           SELECT split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i - 1] AS context, tk[i] AS next_tok
           FROM (SELECT tk, explode(sequence(1, size(tk) - 1)) AS i
                 FROM toks WHERE size(tk) >= 2)
         ), pc AS (
           SELECT context, next_tok, count(*) AS n_pair FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT context, sum(n_pair) AS ctx_total FROM pc GROUP BY 1
         ), top_ctx AS (
           SELECT context, ctx_total FROM (
             SELECT context, ctx_total,
               row_number() OVER (ORDER BY ctx_total DESC, context ASC) AS cr
             FROM ctx) WHERE cr <= 20)
         SELECT context, CAST(rk AS BIGINT) AS rk, next_tok, n_pair,
           floor((CAST(n_pair AS DOUBLE) / CAST(ctx_total AS DOUBLE))*1e4
             + 0.5)/1e4 AS prob
         FROM (
           SELECT p.context, p.next_tok, p.n_pair, t.ctx_total,
             row_number() OVER (PARTITION BY p.context
               ORDER BY p.n_pair DESC, p.next_tok ASC) AS rk
           FROM pc p JOIN top_ctx t USING (context))
         WHERE rk <= 3 ORDER BY context, rk""",
    "t11_heavy_hitters" ->
      """WITH w AS (
           SELECT explode(split(trim(text), '\\s+')) AS w FROM documents
         ), c AS (SELECT w, count(*) AS n FROM w GROUP BY 1)
         SELECT rk, w, n FROM (
           SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rk
           FROM c)
         WHERE rk <= 10 ORDER BY rk""",
    "t12_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT doc_id, i - 1 AS pos, element_at(tk, CAST(i AS INT)) AS v,
             element_at(tk, CAST(i + 1 AS INT)) AS w
           FROM (SELECT doc_id, tk, explode(sequence(1, size(tk) - 1)) AS i
                 FROM toks WHERE size(tk) >= 2)
         ), cvw AS (SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
         ), cv AS (SELECT v, count(*) AS cv FROM bg GROUP BY 1
         ), vocab AS (
           SELECT count(DISTINCT tk2) AS vsz
           FROM (SELECT explode(tk) AS tk2 FROM toks)
         ), scored AS (
           SELECT bg.doc_id, bg.pos,
             log((CAST(cvw AS DOUBLE) + 1.0)
                / (CAST(cv AS DOUBLE) + CAST(vsz AS DOUBLE))) AS lnp
           FROM bg JOIN cvw USING (v, w) JOIN cv USING (v) CROSS JOIN vocab
         ), folded AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             aggregate(transform(array_sort(collect_list(struct(pos, lnp))),
                 s -> s.lnp),
               CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS lnp_sum
           FROM scored GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
           floor(((-lnp_sum) / CAST(n_bigrams AS DOUBLE))*1e4 + 0.5)/1e4
             AS cross_entropy,
           floor(exp((-lnp_sum) / CAST(n_bigrams AS DOUBLE))*1e4 + 0.5)/1e4
             AS ppl
         FROM folded ORDER BY doc_id""",
    "t28_zipf_profile" -> t28SparkSql,
    "t29_unigram_encode" -> t29SparkSql
  )
}
