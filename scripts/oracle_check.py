#!/usr/bin/env python3
"""Dev-side replica of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <outDir> [--json <path>]
  <outDir> is what graft.Verify wrote: one parquet dir per query name +
  oracle_sql.json. Runs each oracle SQL in DuckDB over views named after
  the parquet tables in <sfDir>, sorts columns by name, and compares
  values row-by-row (in result order) against the Spark parquet.

  --json <path>: additionally write a driver-shaped per-query map
  {name: {rows_match, schema_match, hash_match, err}} so each round close
  can commit a CORRECTNESS_dev_r{N}.json even when the driver pipeline
  records nothing (VERDICT r13 task 1).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str, json_path: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    report = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)])
                        if files else pd.DataFrame())
        if name not in oracles:
            nonempty = len(spark_df) > 0
            print(f"[rows-only] {name}: {len(spark_df)} rows "
                  f"{'OK' if nonempty else 'EMPTY (suspicious?)'}")
            report[name] = {"rows_match": nonempty, "schema_match": None,
                            "hash_match": None,
                            "err": None if nonempty else "rows-only check: empty result"}
            continue
        try:
            duck_df = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"oracle SQL error: {e}"}
            continue
        ok, why = compare(spark_df, duck_df)
        if ok:
            print(f"[ok]   {name}: {len(spark_df)} rows, "
                  f"{len(spark_df.columns)} cols")
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None}
        else:
            print(f"[FAIL] {name}: {why}")
            failures += 1
            report[name] = {
                "rows_match": len(spark_df) == len(duck_df),
                "schema_match": list(spark_df.columns) == list(duck_df.columns),
                "hash_match": False, "err": why}
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"[json] wrote {len(report)} entries to {json_path}")
    return failures

def compare(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av_f = av.astype(float)
                bv_f = bv.astype(float)
                bad = ~((av_f == bv_f) | (av_f.isna() & bv_f.isna()))
            else:
                av_s = av.astype(str)
                bv_s = bv.astype(str)
                bad = av_s != bv_s
        except Exception as e:
            return False, f"col {c}: compare error {e}"
        if bad.any():
            i = bad.idxmax()
            return False, (f"col {c} differs at row {i}: "
                           f"spark={a[c][i]!r} duck={b[c][i]!r} "
                           f"({int(bad.sum())}/{len(a)} rows differ)")
    return True, ""

if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = None
    if "--json" in argv:
        i = argv.index("--json")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], jp))
