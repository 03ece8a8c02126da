#!/usr/bin/env python3
"""Decomposed sf0.1 oracle for v06_dedup_impact (VERDICT r13 task 5).

The monolithic v06 DuckDB oracle carries the d03-contract all-pairs
shingle join PLUS a recursive-CTE connected components — infeasible at
sf0.1 (blew a 40-minute cap in r13). But v06 is by construction the
composition of three independently sf0.1-ORACLE-VERIFIED frames:

  exact_dedup  = the d01 content-fingerprint rule (cheap in DuckDB),
  near_dedup   = keep-best over the d05_dup_clusters result,
  span_dedup   = an aggregate of the t26_span_coverage result.

So at sf0.1 we verify v06 against its verified parts: run DuckDB only
for the CHEAP glue (fingerprints, keep-best ranking, aggregates) and
take the expensive cluster/coverage frames from the Verify dumps that
the normal sweep already hash-verified against their own oracles.

Usage: v06_check.py <sfDir> <outDir>
  <outDir> = a graft.Verify output containing d05_dup_clusters/,
  t26_span_coverage/ and v06_dedup_impact/ parquet dirs (e.g. from
  SPARK_GRAFT_ONLY=d05,t26,v06 graft.Verify <sfDir> <outDir>).
Exit 0 iff all three (stage, docs_affected, tokens_removed) rows match.
"""
import sys
import duckdb


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{sf_dir}/documents.parquet')""")
    con.execute(f"""CREATE VIEW d05 AS
        SELECT * FROM read_parquet('{out_dir}/d05_dup_clusters/*.parquet')""")
    con.execute(f"""CREATE VIEW t26 AS
        SELECT * FROM read_parquet('{out_dir}/t26_span_coverage/*.parquet')""")
    con.execute(f"""CREATE VIEW v06 AS
        SELECT * FROM read_parquet('{out_dir}/v06_dedup_impact/*.parquet')""")

    expected = con.execute(r"""
      WITH vbase AS (
        SELECT doc_id, n_chars,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents
      ), exact AS (
        SELECT 'exact_dedup' AS stage,
          CAST(coalesce(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS docs_affected,
          CAST(coalesce(sum(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END), 0)
            AS BIGINT) AS tokens_removed
        FROM (SELECT n_tokens, row_number() OVER (PARTITION BY fp
                ORDER BY doc_id) AS rk FROM vbase)
      ), vkeep AS (
        -- keep-best over the VERIFIED d05 clusters: longest doc wins,
        -- ties to the lower id (the d08/d10 rule v06 composes)
        SELECT cluster, doc_id AS kept FROM (
          SELECT c.cluster, c.doc_id,
            row_number() OVER (PARTITION BY c.cluster
              ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
          FROM d05 c JOIN documents d USING (doc_id))
        WHERE rk = 1
      ), near AS (
        SELECT 'near_dedup' AS stage,
          CAST(coalesce(sum(CASE WHEN c.doc_id <> k.kept
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_affected,
          CAST(coalesce(sum(CASE WHEN c.doc_id <> k.kept
            THEN b.n_tokens ELSE 0 END), 0) AS BIGINT) AS tokens_removed
        FROM d05 c JOIN vkeep k USING (cluster)
        JOIN vbase b USING (doc_id)
      ), span AS (
        -- the engine's span stage IS this aggregate of the VERIFIED
        -- t26 frame
        SELECT 'span_dedup' AS stage,
          CAST(coalesce(sum(CASE WHEN covered_tokens > 0 THEN 1 ELSE 0 END),
            0) AS BIGINT) AS docs_affected,
          CAST(coalesce(sum(covered_tokens), 0) AS BIGINT) AS tokens_removed
        FROM t26)
      SELECT * FROM exact UNION ALL SELECT * FROM near
      UNION ALL SELECT * FROM span ORDER BY stage
    """).fetchall()

    got = con.execute(
        "SELECT stage, docs_affected, tokens_removed FROM v06 ORDER BY stage"
    ).fetchall()

    ok = got == expected
    for g, e in zip(got, expected):
        mark = "ok " if g == e else "FAIL"
        print(f"[{mark}] {g[0]}: engine={g[1:]} decomposed={e[1:]}")
    if len(got) != len(expected) or not ok:
        print(f"[FAIL] v06 decomposed check: engine={got} expected={expected}")
        return 1
    print("[ok]   v06_dedup_impact == decomposition of verified d01/d05/t26")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
